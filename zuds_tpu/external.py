"""External catalog records (reference: zuds/external.py).

The reference maps the full LegacySurvey DR8 north/south (~150 cols) and CLU
galaxy catalogs in postgres. Here the tables carry the columns the alert
enrichment actually reads; bulk columns live in the JSON ``extra`` blob.
"""
from __future__ import annotations

from .db.orm import Column, Model

__all__ = ['DR8North', 'DR8South', 'CLU']


class _DR8Base(Model):
    __abstract__ = True

    ra = Column('REAL', index=True)
    dec = Column('REAL', index=True)
    objid = Column('INTEGER')
    brickid = Column('INTEGER')
    type = Column('TEXT')
    flux_g = Column('REAL')
    flux_r = Column('REAL')
    flux_z = Column('REAL')
    flux_w1 = Column('REAL')
    gaia_phot_g_mean_mag = Column('REAL')
    z_phot_median = Column('REAL')
    z_phot_l95 = Column('REAL')
    z_spec = Column('REAL')
    extra = Column('TEXT')     # JSON of remaining DR8 columns


class DR8North(_DR8Base):
    __tablename__ = 'dr8_north'


class DR8South(_DR8Base):
    __tablename__ = 'dr8_south'


class CLU(Model):
    """Census of the Local Universe galaxy catalog."""

    __tablename__ = 'clu'

    cluid = Column('INTEGER')
    name = Column('TEXT')
    ra = Column('REAL', index=True)
    dec = Column('REAL', index=True)
    z = Column('REAL')
    zerr = Column('REAL')
    distmpc = Column('REAL')
    sfr_fuv = Column('REAL')
    mstar = Column('REAL')
    a = Column('REAL')
    b2a = Column('REAL')
    pa = Column('REAL')
    btc = Column('REAL')
    extra = Column('TEXT')
