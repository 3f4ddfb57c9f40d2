"""Quadrant-scale realistic-scene night test (VERDICT r3 items #1/#6).

One full 3080x3072 science/reference pair with everything the isolated-
Gaussian fixtures lack — Sersic galaxies, a sky gradient + vignetting
bowl, cosmic rays, dead columns / hot pixels / saturation-style mask
bits, a dense power-law star field — run through the PRODUCTION batched
night driver (scripts/donight.run_night). Asserts what the r3 round
shipped without: the candidate funnel is non-degenerate and the planted
transient survives filter_sexcat at production scale.

This is the synthetic stand-in for the reference's real-pixel golden
tests (``/root/reference/zuds/tests/suite/test_sub.py:9-37``), which
need network access to NERSC.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'scripts'))

from scene_util import write_scene_pair

H, W = 3080, 3072
TRANSIENT = (1200.3, 800.7, 40000.0)


@pytest.fixture(scope='module')
def night_results(tmp_path_factory):
    from donight import run_night
    from zuds_tpu.constants import KERNEL_SPATIAL_ORDER
    from zuds_tpu.parallel import PipelineConfig

    d = str(tmp_path_factory.mktemp('scene'))
    sci_path, ref_path, truth = write_scene_pair(
        d, H, W, transient=TRANSIENT)
    cfg = PipelineConfig(height=H, width=W, ksize=15, stamp=41, smax=384,
                         order=KERNEL_SPATIAL_ORDER, nreg=3, max_det=4096,
                         det_cap=1 << 16, deb_cap=1 << 16, interleave=1)
    results = run_night([f'{sci_path} {ref_path}'], batch=1, ml=False,
                        db=False, cfg=cfg)
    from zuds_tpu.catalog import PipelineFITSCatalog
    import glob
    catp = glob.glob(os.path.join(d, 'sub.*.cat'))
    assert catp, 'night driver produced no catalog'
    cat = PipelineFITSCatalog.from_file(catp[0])
    return results, cat, truth


def test_transient_survives_filter(night_results):
    """The planted transient must survive the full production cut chain
    at quadrant scale (r3 shipped a driver that cut 100% of candidates
    on every full-scale frame; VERDICT r3 weak #1)."""
    results, cat, truth = night_results
    path, n = results[0]
    assert not isinstance(n, Exception), n
    g = cat.data[cat.data['GOODCUT'] == 1]
    assert len(g) >= 1
    dist = np.hypot(g['X_IMAGE'] - (TRANSIENT[0] + 1),
                    g['Y_IMAGE'] - (TRANSIENT[1] + 1))
    assert dist.min() < 1.5, f'transient not among survivors ({dist.min():.1f} px)'
    row = g[np.argmin(dist)]
    assert row['FLUX_APER'] > 0.5 * TRANSIENT[2]


def test_funnel_nondegenerate(night_results):
    """Cuts must remove junk without wiping the catalog: plenty of raw
    candidates (star/galaxy residuals, CRs), a small survivor set."""
    results, cat, truth = night_results
    data = cat.data
    n_total = len(data)
    n_surv = int((data['GOODCUT'] == 1).sum())
    assert n_total > 50, f'expected a busy raw catalog, got {n_total}'
    assert 1 <= n_surv < n_total
    assert n_surv <= 50, 'survivor count should pass the MAX_DETS guard'


def test_cosmic_rays_rejected(night_results):
    """Sharp (un-PSF-ed) cosmic-ray streaks must be cut by the
    elongation/FWHM cuts (reference zuds/filterobjects.py:125-148);
    braai would kill stragglers, so require >=90% rejection here."""
    results, cat, truth = night_results
    g = cat.data[cat.data['GOODCUT'] == 1]
    crs = truth['crs']
    hits = 0
    for row in g:
        d = np.hypot(crs[:, 0] - (row['X_IMAGE'] - 1),
                     crs[:, 1] - (row['Y_IMAGE'] - 1)).min()
        hits += d < 3.0
    assert hits <= max(1, len(crs) // 10), f'{hits} CRs survived the cuts'


def test_overflow_confined(night_results):
    """Capacity overflows, if any, must be frame-header diagnostics plus
    per-object flags — never a catalog-wide FLAGS wipeout."""
    results, cat, truth = night_results
    data = cat.data
    clean = (data['FLAGS'] & (64 | 128)) == 0
    # the transient region (top third) must be overflow-free
    assert clean.sum() > 0.5 * len(data)
    for k in ('OVFPIX', 'OVFDEBLE', 'OVFOBJ'):
        assert k in cat.header


# --------------------------------------------------------------------------
# Multi-epoch recall (VERDICT r4 item 3): a night of >=4 dithered,
# seeing-varied epochs against ONE reference through the production
# driver; EVERY frame must recover its planted 30k transient. A miss is
# a test FAILURE, not a bench footnote (the r4 files-bench shipped
# detections_per_frame [2,2,0,1,1,1]).
# --------------------------------------------------------------------------

EPOCHS = [
    {'dither': (2.1, -1.7), 'seeing': 2.4,
     'transient': (500.0, 600.0, 30000.0)},
    {'dither': (-3.4, 2.2), 'seeing': 2.8,
     'transient': (757.0, 793.0, 30000.0)},     # bench frame-1 analogue
    {'dither': (0.6, 0.2), 'seeing': 3.2,
     'transient': (1014.0, 986.0, 30000.0)},    # bench frame-2 analogue
    {'dither': (5.1, -4.8), 'seeing': 2.6,
     'transient': (1271.0, 1179.0, 30000.0)},   # bench frame-3 (the r4 miss)
]


@pytest.fixture(scope='module')
def recall_results(tmp_path_factory):
    from donight import run_night
    from zuds_tpu.constants import KERNEL_SPATIAL_ORDER
    from zuds_tpu.parallel import PipelineConfig
    from scene_util import write_scene_night

    d = str(tmp_path_factory.mktemp('recall'))
    ref_path, sci_paths, truths = write_scene_night(d, H, W, EPOCHS)
    # IDENTICAL config to the night_results fixture: the jitted program
    # is reused from the in-process cache (one XLA:CPU compile per module)
    cfg = PipelineConfig(height=H, width=W, ksize=15, stamp=41, smax=384,
                         order=KERNEL_SPATIAL_ORDER, nreg=3, max_det=4096,
                         det_cap=1 << 16, deb_cap=1 << 16, interleave=1)
    results = run_night([f'{p} {ref_path}' for p in sci_paths], batch=1,
                        ml=False, db=False, cfg=cfg)
    from zuds_tpu.catalog import PipelineFITSCatalog
    refstem = os.path.basename(ref_path)[:-5]
    cats = []
    for p in sci_paths:
        stem = os.path.basename(p)[:-5]
        catp = os.path.join(d, f'sub.{stem}_{refstem}.cat')
        cats.append(PipelineFITSCatalog.from_file(catp)
                    if os.path.exists(catp) else None)
    return results, cats, truths


def test_every_epoch_recovers_its_transient(recall_results):
    """frames_with_detections == pairs, as a hard assertion."""
    results, cats, truths = recall_results
    assert len(results) == len(EPOCHS)
    misses = []
    for k, ((path, n), cat, truth) in enumerate(
            zip(results, cats, truths)):
        assert not isinstance(n, Exception), f'epoch {k}: {n}'
        assert cat is not None, f'epoch {k}: no catalog written'
        g = cat.data[cat.data['GOODCUT'] == 1]
        tx, ty, tf = truth['transient']
        if len(g) == 0:
            misses.append((k, 'empty survivor set'))
            continue
        dist = np.hypot(g['X_IMAGE'] - (tx + 1), g['Y_IMAGE'] - (ty + 1))
        if dist.min() >= 1.5:
            misses.append((k, f'nearest survivor {dist.min():.1f} px'))
    assert not misses, f'epochs missing their planted transient: {misses}'


def test_epoch_catalogs_have_pipeline_provenance(recall_results):
    """Every epoch ran the BATCHED path (no silent per-pair fallback):
    from_pipeline stamps the overflow diagnostics; the fallback path
    does not (the r5 NameError in prepare_frame_inputs was invisible
    because the fallback silently produced catalogs — this pins it)."""
    results, cats, truths = recall_results
    for k, cat in enumerate(cats):
        for key in ('OVFPIX', 'OVFDEBLE', 'OVFOBJ'):
            assert key in cat.header, f'epoch {k} lacks {key} (fallback?)'
