"""Worker-script and control-plane tests (the layer the reference never
tested; SURVEY §4 calls this out as a gap to close)."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'scripts'))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'control'))


@pytest.fixture()
def db(tmp_path, tmp_config):
    import zuds_tpu.model_util as mu
    from zuds_tpu.core import DBSession
    mu.init_db(database=str(tmp_path / 'ctrl.db'))
    mu.create_tables()
    yield DBSession()
    DBSession.remove()


def test_cluster_positions():
    from makesources import cluster_positions
    ra = np.array([150.0, 150.0001, 150.1, 150.1001, 151.0])
    dec = np.array([35.0, 35.0001, 35.0, 35.00005, 35.0])
    labels = cluster_positions(ra, dec)
    assert labels[0] == labels[1]
    assert labels[2] == labels[3]
    assert labels[0] != labels[2]
    assert labels[4] not in (labels[0], labels[2])


def test_associate_matches_and_names(db):
    from makesources import associate
    from zuds_tpu.detections import Detection
    from zuds_tpu.source import Source

    # an existing source + two nearby new detections
    db.add(Source(id='ZUDS26aaaaaa', ra=150.0, dec=35.0, origin='test'))
    db.add(Detection(ra=150.00005, dec=35.00002, goodcut=1, rb=0.9,
                     flux_aper=100, fluxerr_aper=5))
    # a fresh pair of detections far from any source -> new source
    db.add(Detection(ra=152.0, dec=30.0, goodcut=1, rb=0.8,
                     flux_aper=80, fluxerr_aper=5))
    db.add(Detection(ra=152.00003, dec=30.00004, goodcut=1, rb=0.7,
                     flux_aper=90, fluxerr_aper=5))
    # a low-rb orphan must NOT become a source
    db.add(Detection(ra=149.0, dec=20.0, goodcut=1, rb=0.05,
                     flux_aper=60, fluxerr_aper=5))
    db.commit()

    matched, new = associate(db)
    assert matched == 1
    assert new == 1
    srcs = db.query(Source).all()
    assert len(srcs) == 2
    named = [s for s in srcs if s.id != 'ZUDS26aaaaaa'][0]
    assert named.id.startswith('ZUDS')
    dets = db.query(Detection).filter('source_id IS NOT NULL').all()
    assert len(dets) == 3


def test_controller_unprocessed_pairs(db):
    from controller import unprocessed_pairs
    from zuds_tpu.core import ZTFFile
    from zuds_tpu.bookkeeping import FailedSubtraction

    quad = dict(field=679, ccdid=1, qid=2, fid=2)
    db.add(ZTFFile(type='ref', basename='ref.fits', **quad))
    db.add(ZTFFile(type='sci', basename='sci1.fits', **quad))
    db.add(ZTFFile(type='sci', basename='sci2.fits', **quad))
    db.add(ZTFFile(type='sci', basename='sci3.fits', **quad))
    db.commit()
    ref_id = db.query(ZTFFile).filter_by(basename='ref.fits').first().id
    sci2 = db.query(ZTFFile).filter_by(basename='sci2.fits').first()
    sci3 = db.query(ZTFFile).filter_by(basename='sci3.fits').first()
    # sci2 already subtracted; sci3 known-bad
    db.add(ZTFFile(type='sesub', basename='sub2.fits', target_id=sci2.id,
                   reference_id=ref_id, **quad))
    db.add(FailedSubtraction(target_image_id=sci3.id,
                             reference_image_id=ref_id))
    db.commit()

    pairs = unprocessed_pairs(db)
    assert pairs == [('sci1.fits', 'ref.fits')]


def test_controller_run_once_local(db, tmp_path, monkeypatch):
    """run_once chunks work and tracks a Job through the local launcher."""
    from controller import run_once, refresh_job_status
    from zuds_tpu.core import ZTFFile
    from zuds_tpu.bookkeeping import Job

    quad = dict(field=679, ccdid=1, qid=2, fid=2)
    db.add(ZTFFile(type='ref', basename='r.fits', **quad))
    db.add(ZTFFile(type='sci', basename='s.fits', **quad))
    db.commit()

    class FakeLauncher:
        def __init__(self):
            self.submitted = []

        def submit(self, path, script=None):
            self.submitted.append(path)
            return 'job-1'

        def status(self, job_id):
            return 'done'

    launcher = FakeLauncher()
    jobs = run_once(db, launcher, str(tmp_path))
    assert len(jobs) == 1
    assert open(launcher.submitted[0]).read().strip() == 's.fits r.fits'
    refresh_job_status(db, launcher)
    assert db.query(Job).first().status == 'done'


def test_stack_windows():
    from querystack import stack_windows
    rows = []
    for i in range(10):
        rows.append((f'e{i}.fits', 679, 1, 2, 2, 58345.0 + i, f'e{i}.fits'))
    # second quadrant with one epoch only -> no stack
    rows.append(('x.fits', 680, 1, 2, 2, 58345.0, 'x.fits'))
    lines = stack_windows(rows)
    assert len(lines) == 2          # 10 days -> two 7-day bins
    first = lines[0].split()
    assert first[0].startswith('stack_000679')
    assert len(first) == 3 + 7      # outname binleft binright + 7 epochs


def test_makeref_quality_cut(tmp_path):
    from makeref import quality_cut

    class FakeIm:
        def __init__(self, seeing, maglim, infobits=0):
            self.header = {'SEEING': seeing, 'MAGLIM': maglim,
                           'INFOBITS': infobits}
            self.pixel_scale = 1.01

        @property
        def header_get(self):
            return self.header

    # dict-like access used by quality_cut
    class H(dict):
        def get(self, k, d=None):
            return super().get(k, d)

    ims = [FakeIm(2.0, 20.5), FakeIm(3.5, 20.5), FakeIm(2.0, 18.0),
           FakeIm(2.0, 21.0, infobits=4)]
    for im in ims:
        im.header = H(im.header)
    good = quality_cut(ims)
    assert len(good) == 1
    assert good[0].header['SEEING'] == 2.0
    assert good[0].header['MAGLIM'] == 20.5


def test_dophot_merge(db, tmp_path, monkeypatch):
    """dophot writes per-rank CSV and merges on rank 0."""
    import dophot
    merged = dophot.main(str(tmp_path / 'empty.txt'), str(tmp_path)) \
        if _write(tmp_path / 'empty.txt', '') else None
    assert merged is not None
    assert os.path.exists(merged)
    header = open(merged).readline()
    assert header.startswith('source_id,image_id')


def _write(path, content):
    with open(path, 'w') as f:
        f.write(content)
    return True


def test_archive_roundtrip(db, tmp_path, tmp_config):
    """Cold-tier tar archive + retrieval (the HPSS analogue)."""
    import yaml
    import zuds_tpu.secrets as secrets
    # point the hot tier at tmp
    cfgpath = secrets._manager.config_path()
    cfg = yaml.safe_load(open(cfgpath))
    hot = str(tmp_path / 'hot')
    cfg['base_data_directory'] = hot
    with open(cfgpath, 'w') as f:
        yaml.safe_dump(cfg, f)
    secrets._manager.cache = None

    import os
    os.makedirs(hot, exist_ok=True)
    from zuds_tpu.core import ZTFFile
    for i in range(3):
        with open(os.path.join(hot, f'q{i}.fits'), 'wb') as f:
            f.write(b'x' * 100)
        db.add(ZTFFile(type='sci', basename=f'q{i}.fits', field=679,
                       ccdid=1, qid=2, fid=2))
    db.commit()

    from archive_daemon import archive_to_cold, retrieve_from_cold
    cold = str(tmp_path / 'cold')
    tar_path = archive_to_cold(db, cold)
    assert tar_path and os.path.exists(tar_path)
    dest = str(tmp_path / 'restore')
    restored = retrieve_from_cold(db, ['q1.fits', 'q2.fits'], cold, dest)
    assert len(restored) == 2
    assert open(restored[0], 'rb').read() == b'x' * 100


def test_update_tap_sync(db):
    """IRSA TAP metadata reflection against a canned CSV response
    (reference scripts/update.py:40-99 via ztfquery; here a real TAP
    query/parse/insert path with the network fetch injected)."""
    import json
    import update
    from zuds_tpu.core import ZTFFile

    q = update.build_query(411, 441)
    assert 'nid >= 411' in q and 'ipac_gid > 0' in q
    assert update.META_TABLE in q

    header = ','.join(update.META_COLUMNS)
    row1 = ('679,5,2,2,zr,o,20200301123456,2458915.5,0,1001,800,55,2.1,'
            '1.2,0.5,0.1,20.5,1536.5,1540.5,150.1,35.2,-0.0003,0.0,0.0,'
            '0.0003,150.1,35.2,149.9,35.0,150.3,35.0,150.3,35.4,149.9,'
            '35.4,2,30.0')
    row2 = row1.replace('679,5,2,2', '680,6,3,1').replace('zr', 'zg')
    csv_text = header + '\n' + row1 + '\n' + row2 + '\n'

    calls = []

    def fake_fetch(nid_lo, nid_hi, auth=None):
        calls.append((nid_lo, nid_hi))
        return csv_text if not calls[1:] else header + '\n'

    n = update.sync(fetch=fake_fetch, now_jd=2458915.5 + 45)
    assert n == 2
    assert len(calls) >= 1
    imgs = db.query(ZTFFile).filter_by(type='sci').all()
    assert len(imgs) == 2
    img = [i for i in imgs if i.field == 679][0]
    assert img.basename == 'ztf_20200301123456_000679_zr_c05_o_q2_sciimg.fits'
    assert img.obsjd == 2458915.5
    hdr = json.loads(img.header)
    assert hdr['DBNID'] == 800 and hdr['PROGRMID'] == 2
    masks = db.query(ZTFFile).filter_by(type='mask').all()
    assert len(masks) == 2
    assert masks[0].basename.endswith('mskimg.fits')
    assert {m.parent_id for m in masks} == {i.id for i in imgs}

    # idempotent: a second sync with the same response inserts nothing new
    calls.clear()
    n2 = update.sync(fetch=fake_fetch, now_jd=2458915.5 + 45)
    assert n2 == 0


def test_retrieval_media_order(tmp_path, monkeypatch):
    """Cold-tier restores follow physical media order (the reference's
    hsi ls -P tape-position sort, nersc/retrieve.py:20-180)."""
    import sys as _sys
    import tarfile
    _sys.path.insert(0, str(
        __import__('pathlib').Path(__file__).parent.parent / 'control'))
    import archive_daemon as ad

    cold = tmp_path / 'cold'
    cold.mkdir()
    dest = tmp_path / 'dest'
    for t, member in [('a.tar', 'x1.fits'), ('b.tar', 'x2.fits')]:
        src = tmp_path / member
        src.write_bytes(b'\x00' * 64)
        with tarfile.open(cold / t, 'w') as tf:
            tf.add(src, arcname=member)

    class FakeSession:
        def execute(self, sql, params):
            name = params[0]
            return type('R', (), {'fetchone': staticmethod(
                lambda: ('a.tar',) if name == 'x1.fits' else ('b.tar',))})()

    order = []
    real_open = tarfile.open

    def spy_open(path, *a, **k):
        order.append(str(path).split('/')[-1])
        return real_open(path, *a, **k)

    monkeypatch.setattr(tarfile, 'open', spy_open)
    # force reversed media order: b.tar physically precedes a.tar
    monkeypatch.setattr(ad, 'media_locator', lambda paths: {
        p: ('T1', 5 if p.endswith('a.tar') else 2) for p in paths})
    restored = ad.retrieve_from_cold(FakeSession(), ['x1.fits', 'x2.fits'],
                                     str(cold), str(dest))
    assert order == ['b.tar', 'a.tar']
    assert sorted(r.split('/')[-1] for r in restored) == \
        ['x1.fits', 'x2.fits']
