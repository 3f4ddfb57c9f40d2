"""Native FITS library tests: parity with the python codec + prefetch pool."""
import numpy as np
import pytest

from zuds_tpu.fits import Header, HDU, read_fits, write_fits
from zuds_tpu.fits import native


pytestmark = pytest.mark.skipif(
    not (native.available() or native.build()),
    reason='native library not built and no toolchain')


@pytest.mark.parametrize('dtype', ['float32', 'int16', 'int32', 'uint16'])
def test_native_read_matches_python(tmp_path, rng, dtype):
    if dtype == 'uint16':
        data = rng.integers(0, 65535, (128, 96)).astype(dtype)
    elif dtype.startswith('int'):
        data = rng.integers(-30000, 30000, (128, 96)).astype(dtype)
    else:
        data = rng.normal(150, 12, (128, 96)).astype(dtype)
    h = Header()
    h.set('MAGZP', 26.3)
    h.set('FIELDID', 679)
    path = str(tmp_path / 'x.fits')
    write_fits(path, [HDU(h, data)])

    out = native.read_image_native(path)
    np.testing.assert_array_equal(out.data, data)
    assert out.header['MAGZP'] == 26.3
    assert out.header['FIELDID'] == 679


def test_native_write_matches_python(tmp_path, rng):
    data = rng.normal(150, 12, (64, 48)).astype('f4')
    h = Header()
    h.set('SEEING', 2.2)
    path = str(tmp_path / 'w.fits')
    native.write_image_native(path, h, data)
    back = read_fits(path)[0]
    np.testing.assert_array_equal(back.data, data)
    assert back.header['SEEING'] == 2.2
    # and the native reader round-trips its own writes
    again = native.read_image_native(path)
    np.testing.assert_array_equal(again.data, data)


def test_prefetcher(tmp_path, rng):
    paths = []
    arrays = []
    for i in range(6):
        data = rng.normal(100 + i, 5, (256, 256)).astype('f4')
        h = Header()
        h.set('IDX', i)
        p = str(tmp_path / f'f{i}.fits')
        write_fits(p, [HDU(h, data)])
        paths.append(p)
        arrays.append(data)
    with native.Prefetcher(workers=3) as pf:
        tickets = [pf.submit(p) for p in paths]
        for i, t in enumerate(tickets):
            hdu = pf.get(t)
            np.testing.assert_array_equal(hdu.data, arrays[i])
            assert hdu.header['IDX'] == i


def test_native_read_error(tmp_path):
    with pytest.raises(IOError):
        native.read_image_native(str(tmp_path / 'missing.fits'))
