"""Postgres dialect seam (VERDICT r1 item 9).

Dialect translation and the psycopg2-surface adapter are unit-tested
against a fake driver (no server needed); the end-to-end leg runs against
both backends, with postgres skipped when no server/driver is available —
sqlite stays the zero-dependency default (reference production bus:
postgres+q3c, zuds/model_util.py:132-271).
"""
import numpy as np
import pytest

from zuds_tpu.db.orm import PostgresDialect, SqliteDialect, PGConnection


def test_dialect_translate():
    d = PostgresDialect()
    assert d.translate('SELECT * FROM t WHERE a = ? AND b = ?') == \
        'SELECT * FROM t WHERE a = %s AND b = %s'
    assert SqliteDialect().translate('WHERE a = ?') == 'WHERE a = ?'


def test_dialect_ddl():
    d = PostgresDialect()
    sql = ('CREATE TABLE IF NOT EXISTS x (id INTEGER PRIMARY KEY '
           'AUTOINCREMENT, v REAL, b BLOB, t TEXT)')
    out = d.ddl(sql)
    assert 'BIGSERIAL PRIMARY KEY' in out
    assert 'DOUBLE PRECISION' in out
    assert 'BYTEA' in out
    assert 'AUTOINCREMENT' not in out


class _FakeCursor:
    def __init__(self, log):
        self.log = log
        self.rowcount = 0

    def execute(self, sql, params=()):
        self.log.append((sql, tuple(params)))

    def fetchone(self):
        return {'id': 42}

    def fetchall(self):
        return []


class _FakeConn:
    def __init__(self):
        self.log = []
        self.committed = 0

    def cursor(self):
        return _FakeCursor(self.log)

    def commit(self):
        self.committed += 1

    def rollback(self):
        pass

    def close(self):
        pass


def test_pgconnection_adapter():
    fake = _FakeConn()
    conn = PGConnection(fake)

    cur = conn.execute('INSERT INTO t (a, b) VALUES (?, ?)', (1, 'x'))
    sql, params = fake.log[-1]
    assert sql == 'INSERT INTO t (a, b) VALUES (%s, %s) RETURNING id'
    assert params == (1, 'x')
    assert cur.lastrowid == 42

    conn.execute('SELECT * FROM t WHERE a = ?', (5,))
    assert fake.log[-1][0] == 'SELECT * FROM t WHERE a = %s'

    conn.execute('CREATE TABLE IF NOT EXISTS y (id INTEGER PRIMARY KEY '
                 'AUTOINCREMENT, v REAL)')
    assert 'BIGSERIAL' in fake.log[-1][0]

    conn.commit()
    assert fake.committed == 1


def _postgres_available():
    try:
        import psycopg2  # noqa: F401
    except ImportError:
        return False
    import os
    return bool(os.environ.get('ZUDS_TEST_PG_DSN'))


@pytest.fixture(params=['sqlite'] + (
    ['postgres'] if _postgres_available() else []))
def any_backend(request, tmp_path, tmp_config, monkeypatch):
    import yaml
    import zuds_tpu.secrets as secrets
    import zuds_tpu.model_util as mu
    from zuds_tpu.core import DBSession

    if request.param == 'postgres':
        import os
        dsn = dict(p.split('=') for p in
                   os.environ['ZUDS_TEST_PG_DSN'].split())
        cfgpath = secrets._manager.config_path()
        cfg = yaml.safe_load(open(cfgpath))
        cfg.update({'db_backend': 'postgres',
                    'db_name': dsn.get('dbname'),
                    'db_username': dsn.get('user'),
                    'db_password': dsn.get('password'),
                    'db_host': dsn.get('host', 'localhost'),
                    'db_port': dsn.get('port', 5432)})
        with open(cfgpath, 'w') as f:
            yaml.safe_dump(cfg, f)
        secrets._manager.cache = None
        mu.init_db()
    else:
        mu.init_db(database=str(tmp_path / 'dialect.db'))
    mu.create_tables()
    yield DBSession()
    DBSession.remove()


def test_backend_end_to_end(any_backend):
    """Insert/query/cone-search through whichever backend is bound."""
    from zuds_tpu.core import ZTFFile
    from zuds_tpu.detections import Detection
    from zuds_tpu.spatial import cone_where

    sess = any_backend
    sess.add(ZTFFile(type='sci', basename='d.fits', field=1, ccdid=2,
                     qid=3, fid=2, ra=150.0, dec=35.0))
    sess.add(Detection(ra=150.0001, dec=35.0001, flux_aper=123.0,
                       fluxerr_aper=4.0, goodcut=1))
    sess.commit()

    got = ZTFFile.get_by_basename('d.fits')
    assert got is not None and got.field == 1

    where, params = cone_where(150.0, 35.0, 2.0 / 3600)
    hits = sess.query(Detection).filter(where, *params).all()
    assert len(hits) == 1
    assert hits[0].flux_aper == pytest.approx(123.0)
