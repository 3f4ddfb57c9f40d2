"""Alert packet schema parity + Avro round-trip (VERDICT r1 item 7).

The reference emits 123-field single-stream and 124-field stack-stream
candidate records (zuds/alert_schemas/schema_{single,stack}/candidate.avsc,
assembled in zuds/alert.py:59-293). These tests pin the field counts, the
blockwise structure, and a full write->read round trip of the produced
Avro container through the standalone codec.
"""
import json
import os

import numpy as np
import pytest

from zuds_tpu.alert_fields import (CANDIDATE_FIELDS_SINGLE,
                                   CANDIDATE_FIELDS_STACK,
                                   candidate_defaults)


def test_candidate_field_counts():
    assert len(CANDIDATE_FIELDS_SINGLE) == 123
    assert len(CANDIDATE_FIELDS_STACK) == 124
    names_s = {n for n, _ in CANDIDATE_FIELDS_SINGLE}
    names_k = {n for n, _ in CANDIDATE_FIELDS_STACK}
    assert len(names_s) == 123 and len(names_k) == 124  # no dupes
    assert names_s - names_k == {'jd', 'nid', 'diffmaglim'}
    assert names_k - names_s == {'jdstartstack', 'jdendstack', 'jdmed',
                                 'nframesstack'}


def test_candidate_blocks_present():
    names = {n for n, _ in CANDIDATE_FIELDS_SINGLE}
    for i in (1, 2, 3):
        for base in ('objectidps', 'sgscore', 'distpsnr', 'psgmag',
                     'psrmag', 'psimag', 'pszmag', 'lsobjectid',
                     'lsdistnr', 'lstype', 'lsebv', 'lsg', 'lsr', 'lsz',
                     'lsgaiag', 'lsgaiap', 'lszphotmed', 'lszspec'):
            assert f'{base}{i}' in names, (base, i)
    for n in ('jdstartref', 'jdendref', 'nframesref', 'ndethist_single',
              'ndethist_stack', 'jdstarthist_single', 'jdendhist_stack',
              'alert_type', 'isdiffpos', 'drb', 'drbversion', 'rcid',
              'aimagerat', 'bimagerat', 'ztfname', 'mqid', 'tnsid',
              'pdiffimfilename', 'programpi'):
        assert n in names, n


@pytest.fixture()
def db(tmp_path, tmp_config):
    import zuds_tpu.model_util as mu
    from zuds_tpu.core import DBSession
    mu.init_db(database=str(tmp_path / 'alerts.db'))
    mu.create_tables()
    yield DBSession()
    DBSession.remove()


def _fake_detection(db):
    from zuds_tpu.detections import Detection
    from zuds_tpu.core import ZTFFile, DBSession

    sci = ZTFFile(type='sci', basename='ztf_x_sciimg.fits', field=679,
                  ccdid=5, qid=2, fid=2, obsjd=2458915.5,
                  maglimit=20.5)
    db.add(sci)
    db.commit()
    sub = ZTFFile(type='sesub', basename='sub.ztf_x.fits', field=679,
                  ccdid=5, qid=2, fid=2, target_id=sci.id)
    db.add(sub)
    db.commit()
    det = Detection(ra=150.1, dec=35.2, image_id=sub.id, source_id='ZUDSx',
                    x_image=100.0, y_image=200.0, a_image=1.2, b_image=1.0,
                    elongation=1.2, fwhm_image=2.4, flags_weight=0,
                    imaflags_iso=0, goodcut=1, rb=0.9, flux=1000.0,
                    flux_aper=900.0, fluxerr_aper=30.0, zp=26.0)
    db.add(det)
    db.commit()
    return det, sub, sci


def test_alert_candidate_complete_and_roundtrips(db, tmp_path, monkeypatch):
    """Full candidate built offline; container round-trips byte-exact."""
    from zuds_tpu.alert import Alert
    from zuds_tpu import send as send_mod
    from zuds_tpu.avro import read_avro

    det, sub, sci = _fake_detection(db)

    class _H(dict):
        def get(self, k, d=None):
            return dict.get(self, k, d)

    class _Img:
        pass

    img = _Img()
    img.header = _H({'OBSJD': 2458915.5, 'PROGRMID': 2, 'PROGRMPI': 'Kulkarni',
                     'MAGLIM': 20.5, 'EXPTIME': 30.0, 'DBNID': 800})
    img.id = sub.id
    img.basename = sub.basename
    img.field, img.ccdid, img.qid, img.fid = 679, 5, 2, 2
    img.target_image = img
    img.reference_image = None
    det.image = img

    alert = Alert.from_detection(det, xmatch_enabled=False)
    cand = alert.payload['candidate']
    names = {n for n, _ in CANDIDATE_FIELDS_SINGLE}
    assert set(cand) == names                       # exact field parity
    assert cand['alert_type'] == 'single'
    assert cand['rcid'] == (5 - 1) * 4 + (2 - 1)
    assert cand['jd'] == 2458915.5
    assert cand['programpi'] == 'Kulkarni'
    assert cand['aimagerat'] == pytest.approx(1.2 / 2.4)
    assert cand['ndethist_single'] == 1             # itself (<= mjdcut)

    # serialize -> read back through the standalone codec
    record, schema = send_mod.alert_to_record(alert)
    cand_schema = [f for f in schema['fields'] if f['name'] == 'candidate']
    assert len(cand_schema[0]['type']['fields']) == 123

    path = str(tmp_path / 'alert.avro')
    from zuds_tpu.avro import write_avro
    write_avro(path, schema, [record])
    rschema, records = read_avro(path)
    assert len(records) == 1
    got = records[0]
    assert got['objectId'] == 'ZUDSx'
    assert got['candidate']['ra'] == pytest.approx(150.1)
    assert got['candidate']['drb'] == pytest.approx(0.9)
    assert got['candidate']['sgscore1'] is None
    assert len(got['candidate']) == 123


def test_xmatch_full_blocks(db):
    """Local PS1 + DR8 tables populate the full ps*/ls* blocks."""
    from zuds_tpu.external import PS1, DR8North
    from zuds_tpu.crossmatch import xmatch

    for i in range(3):
        db.add(PS1(objid=1000 + i, ra=150.1 + i * 1e-3, dec=35.2,
                   sgscore=0.9 - i * 0.1, gmag=20.0 + i, rmag=19.5 + i,
                   imag=19.0 + i, zmag=18.5 + i))
    db.add(DR8North(objid=77, ra=150.1001, dec=35.2001, type='REX',
                    ebv=0.03, flux_g=10.0, flux_r=20.0, flux_z=30.0,
                    flux_w1=5.0, flux_w2=4.0, flux_w3=1.0, flux_w4=0.5,
                    gaia_phot_g_mean_mag=19.0, parallax=0.5,
                    z_phot_mean=0.2, z_phot_median=0.19, z_phot_std=0.05,
                    z_phot_l68=0.15, z_phot_u68=0.25, z_phot_l95=0.1,
                    z_phot_u95=0.3, z_spec=0.21))
    db.commit()

    out = xmatch(150.1, 35.2)
    assert out['objectidps1'] == 1000
    assert out['sgscore1'] == pytest.approx(0.9)
    assert out['sgscore3'] == pytest.approx(0.7)
    assert out['psrmag2'] == pytest.approx(20.5)
    assert out['lsobjectid1'] == 77
    assert out['lstype1'] == 'REX'
    assert out['lsg1'] == pytest.approx(22.5 - 2.5 * np.log10(10.0))
    assert out['lszphotmed1'] == pytest.approx(0.19)
    assert out['ztfname'] == ''


def test_xmatch_name_services_local(db):
    """milliquas/TNS/ZTF-name blocks populate from the LOCAL tables
    (reference: Kowalski cone searches, zuds/crossmatch.py:244-383; the
    offline fallback must not degrade to '' when fixtures exist)."""
    from zuds_tpu.external import Milliquas, TNSSource, ZTFName
    from zuds_tpu.crossmatch import xmatch

    db.add(Milliquas(name='MQ 1501+3512', ra=150.1, dec=35.2, rmag=18.2,
                     qso_class='Q', z=1.3))
    db.add(TNSSource(name='2019abc', ra=150.10005, dec=35.2, objtype='SN Ia',
                     redshift=0.05))
    db.add(ZTFName(objectid='ZTF19aaaaaaa', ra=150.1, dec=35.20005))
    db.add(ZTFName(objectid='ZTF18zzzzzzz', ra=150.1, dec=35.2))
    # beyond the 1.5 arcsec cone: must NOT appear
    db.add(ZTFName(objectid='ZTF17far', ra=150.2, dec=35.2))
    db.commit()

    out = xmatch(150.1, 35.2)
    assert out['mqid'] == 'MQ 1501+3512'
    assert out['tnsid'] == '2019abc'
    assert out['ztfname'] == 'ZTF18zzzzzzz,ZTF19aaaaaaa'


def test_send_alert_kafka_produce_branch(db, tmp_path, tmp_config,
                                         monkeypatch):
    """The confluent-kafka produce path (reference zuds/send.py:43-101):
    topic naming, one container message per alert, delivery flush, and DB
    sent-flag — exercised against an injected in-memory Producer (the
    broker itself is external infrastructure, as in the reference)."""
    import datetime
    import io
    import sys
    import types

    from zuds_tpu.alert import Alert
    from zuds_tpu import send as send_mod
    from zuds_tpu.avro import read_avro
    import zuds_tpu.secrets as secrets

    det, sub, sci = _fake_detection(db)
    det.image = None
    alert = Alert.from_detection(det, xmatch_enabled=False)

    tmp_config.write_text('kafka_brokers: broker1:9092,broker2:9092\n')
    tmp_config.chmod(0o600)
    secrets._manager.cache = None

    produced = []
    flushed = []

    class _Producer:
        def __init__(self, conf):
            assert conf['bootstrap.servers'] == 'broker1:9092,broker2:9092'

        def produce(self, topic, value):
            produced.append((topic, value))

        def flush(self):
            flushed.append(True)

    fake = types.ModuleType('confluent_kafka')
    fake.Producer = _Producer
    monkeypatch.setitem(sys.modules, 'confluent_kafka', fake)

    topic = send_mod.send_alert(alert)
    date = datetime.datetime.utcnow().strftime('%Y%m%d')
    assert topic == f'ztf_{date}_programid2_zuds'
    assert flushed and len(produced) == 1
    got_topic, value = produced[0]
    assert got_topic == topic

    # the produced bytes are a complete, readable Avro container
    rschema, records = read_avro(io.BytesIO(value))
    assert len(records) == 1
    assert records[0]['objectId'] == 'ZUDSx'
    assert records[0]['candidate']['ra'] == pytest.approx(150.1)

    # the sent flag persisted
    assert alert.sent == 1
