import os
import stat

import pytest


def test_config_seeded_and_permission_enforced(tmp_config):
    from zuds_tpu.secrets import get_secret, load_config
    cfg = load_config(reload=True)
    assert 'base_data_directory' in cfg
    assert get_secret('db_backend') == 'sqlite'
    # loosen permissions -> refused
    import zuds_tpu.secrets as secrets
    path = secrets._manager.config_path()
    os.chmod(path, 0o644)
    with pytest.raises(PermissionError):
        load_config(reload=True)
    os.chmod(path, 0o600)
    assert load_config(reload=True)


def test_get_secret_default(tmp_config):
    from zuds_tpu.secrets import get_secret
    assert get_secret('definitely_not_a_key', 'fallback') == 'fallback'


def test_quick_background_estimate(rng):
    import numpy as np
    from zuds_tpu.utils import quick_background_estimate
    data = rng.normal(150.0, 12.0, size=(512, 512))
    med, sigma = quick_background_estimate(data)
    assert med == pytest.approx(150.0, abs=0.5)
    assert sigma == pytest.approx(12.0, rel=0.05)


def test_mjd_from_header():
    from zuds_tpu.fits import Header
    from zuds_tpu.utils import mjd_from_header
    h = Header()
    h.set('OBSMJD', 58345.25)
    assert mjd_from_header(h) == 58345.25
    h2 = Header()
    h2.set('DATE-OBS', '2018-08-15T06:00:00.0')
    assert mjd_from_header(h2) == pytest.approx(58345.25, abs=1e-6)


def test_tracing_spans():
    """Structured tracing subsystem (SURVEY §5 gap: the reference has
    print-based timing only)."""
    import io
    import zuds_tpu.tracing as tracing
    tracing.reset()
    with tracing.timed('stage_a'):
        pass
    with tracing.timed('stage_a'):
        pass
    with tracing.timed('stage_b'):
        pass
    snap = tracing.spans()
    assert snap['stage_a'][0] == 2
    assert snap['stage_b'][0] == 1
    buf = io.StringIO()
    tracing.report(buf)
    out = buf.getvalue()
    assert 'stage_a' in out and 'mean' in out

    @tracing.traced('deco')
    def f(x):
        return x + 1

    assert f(1) == 2
    assert tracing.spans()['deco'][0] == 1

    import zuds_tpu as zuds
    assert zuds.timed is tracing.timed
