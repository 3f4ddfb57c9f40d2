"""FITS codec round-trip tests (images, headers, binary tables)."""
import numpy as np
import pytest

from zuds_tpu.fits import Header, HDU, read_fits, write_fits, read_header
from zuds_tpu.fits.header import parse_card, format_card


def test_card_roundtrip_types():
    cases = [
        ('SIMPLE', True, 'conforms'),
        ('BITPIX', -32, ''),
        ('NAXIS1', 3072, 'width'),
        ('CRVAL1', 149.90223456, 'RA'),
        ('FILTER', 'ZTF_g', 'filter name'),
        ('OBJECT', "O'Neill", 'apostrophe'),
        ('MAGZP', 26.325, ''),
        ('BIGEXP', 1.5e-30, 'tiny'),
    ]
    for key, value, comment in cases:
        card = format_card(key, value, comment)
        assert len(card) == 80
        k, v, c = parse_card(card)
        assert k == key
        if isinstance(value, float):
            assert v == pytest.approx(value, rel=1e-12)
        else:
            assert v == value


def test_header_bytes_roundtrip():
    h = Header()
    h.set('EXPTIME', 30.0, 'exposure time')
    h.set('FIELD', 679)
    h.set('FILTER', 'ZTF_r')
    h.set('GOODPIX', True)
    h.add_history('made by zuds_tpu')
    raw = h.to_bytes()
    assert len(raw) % 2880 == 0
    h2 = Header.from_bytes(raw)
    assert h2['EXPTIME'] == 30.0
    assert h2['FIELD'] == 679
    assert h2['FILTER'] == 'ZTF_r'
    assert h2['GOODPIX'] is True
    assert h2.comments['EXPTIME'] == 'exposure time'


@pytest.mark.parametrize('dtype', ['float32', 'float64', 'int16', 'int32',
                                   'uint16', 'uint8'])
def test_image_roundtrip(tmp_path, rng, dtype):
    if dtype.startswith('float'):
        data = rng.normal(150, 12, size=(64, 48)).astype(dtype)
    else:
        info = np.iinfo(dtype)
        data = rng.integers(info.min, info.max, size=(64, 48),
                            endpoint=True).astype(dtype)
    h = Header()
    h.set('MAGZP', 26.3)
    path = tmp_path / 'img.fits'
    write_fits(path, [HDU(h, data)])
    hdus = read_fits(path)
    assert len(hdus) == 1
    out = hdus[0]
    np.testing.assert_array_equal(out.data, data)
    assert out.data.dtype == data.dtype
    assert out.header['MAGZP'] == 26.3


def test_multi_hdu_and_read_header(tmp_path, rng):
    img = rng.normal(size=(16, 16)).astype('float32')
    h0 = Header()
    h0.set('OBSMJD', 58345.25)
    h1 = Header()
    h1.set('EXTNAME', 'SECOND')
    path = tmp_path / 'multi.fits'
    write_fits(path, [HDU(h0, img), HDU(h1, img * 2)])
    hdus = read_fits(path)
    assert len(hdus) == 2
    np.testing.assert_allclose(hdus[1].data, img * 2)
    hdr = read_header(path, ext=1)
    assert hdr['EXTNAME'] == 'SECOND'


def test_bintable_roundtrip(tmp_path, rng):
    n = 37
    table = np.empty(n, dtype=[('X_IMAGE', 'f4'), ('Y_IMAGE', 'f4'),
                               ('FLUX_APER', 'f8'), ('FLAGS', 'i2'),
                               ('NPIX', 'i4'), ('NAME', 'S12'),
                               ('GOODCUT', '?')])
    table['X_IMAGE'] = rng.uniform(0, 3072, n).astype('f4')
    table['Y_IMAGE'] = rng.uniform(0, 3080, n).astype('f4')
    table['FLUX_APER'] = rng.normal(1e4, 10, n)
    table['FLAGS'] = rng.integers(0, 255, n).astype('i2')
    table['NPIX'] = rng.integers(5, 500, n)
    table['NAME'] = [f'ZUDS{i:05d}'.encode() for i in range(n)]
    table['GOODCUT'] = rng.integers(0, 2, n).astype(bool)

    path = tmp_path / 'cat.fits'
    from zuds_tpu.fits import table_to_hdu
    write_fits(path, [table_to_hdu(table)])
    hdus = read_fits(path)
    # table cannot be primary HDU -> empty primary + bintable
    out = hdus[-1].data
    assert out.dtype.names == table.dtype.names
    for name in table.dtype.names:
        if out[name].dtype.kind == 'f':
            np.testing.assert_allclose(out[name], table[name])
        elif name == 'GOODCUT':
            np.testing.assert_array_equal(out[name].astype(bool),
                                          table[name])
        else:
            np.testing.assert_array_equal(out[name], table[name])


def test_vector_column_roundtrip(tmp_path, rng):
    table = np.empty(5, dtype=[('ID', 'i4'), ('CUTOUT', 'f4', (9,))])
    table['ID'] = np.arange(5)
    table['CUTOUT'] = rng.normal(size=(5, 9)).astype('f4')
    path = tmp_path / 'vec.fits'
    from zuds_tpu.fits import table_to_hdu
    write_fits(path, [table_to_hdu(table)])
    out = read_fits(path)[-1].data
    np.testing.assert_allclose(out['CUTOUT'], table['CUTOUT'])


def test_blocked_sizes(tmp_path):
    # data sizes straddling the 2880-byte block boundary
    for n in [2879, 2880, 2881]:
        data = np.arange(n, dtype='uint8')
        path = tmp_path / f'b{n}.fits'
        write_fits(path, [HDU(Header(), data)])
        out = read_fits(path)[0].data
        np.testing.assert_array_equal(out, data)


def test_logical_column_is_ascii_tf(tmp_path):
    # FITS 'L' columns store ASCII 'T'/'F' (astropy/fitsio interop), and
    # read back as numpy bool
    from zuds_tpu.fits import table_to_hdu
    table = np.zeros(4, dtype=[('good', '?'), ('x', 'f4')])
    table['good'] = [True, False, True, False]
    path = tmp_path / 'logical.fits'
    write_fits(path, [table_to_hdu(table)])
    blob = path.read_bytes()
    start = blob.find(b'XTENSION')
    dstart = ((blob.find(b'END', start) // 2880) + 1) * 2880
    assert blob[dstart] == ord('T') and blob[dstart + 5] == ord('F')
    out = read_fits(path)[-1].data
    assert out['good'].dtype == np.dtype(bool)
    np.testing.assert_array_equal(out['good'], table['good'])


def test_long_string_continue_roundtrip():
    long = 'a/very/long/' + 'x' * 150 + '/sciimg.fits'
    h = Header()
    h.set('FILENAME', long, 'where it lives')
    h.set('QUOTES', ("it's an 'awkward' long value " * 5).rstrip())
    h2 = Header.from_bytes(h.to_bytes())
    assert h2['FILENAME'] == long
    assert h2['QUOTES'] == h['QUOTES']
    assert h2.comments['FILENAME'] == 'where it lives'


def test_foreign_continue_cards_parse():
    cards = ''.join(c.ljust(80) for c in [
        "FILENAME= 'abcdefghij&'",
        "CONTINUE  'klmnopqrst&'",
        "CONTINUE  'uvwxyz'              / tail comment",
        "END",
    ])
    h = Header.from_bytes(cards)
    assert h['FILENAME'] == 'abcdefghijklmnopqrstuvwxyz'
    assert h.comments['FILENAME'] == 'tail comment'


def test_oversize_numeric_value_raises():
    from zuds_tpu.fits.header import format_card
    import pytest
    with pytest.raises(ValueError):
        format_card('BIGINT', 10 ** 100)
