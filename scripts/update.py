#!/usr/bin/env python
"""IPAC metadata reflection cron — pull new ZTF science-image metadata from
the IRSA TAP service into the DB (reference: scripts/update.py:40-99, which
uses ztfquery.load_metadata over 30-day NID windows and inserts
ScienceImage + sibling MaskImage rows for anything not already present).

The TAP query/parse/insert logic is real and unit-testable against a canned
CSV response (tests/test_scripts.py); only the network fetch itself is gated
on credentials + the requests stack.
"""
import csv
import io
import sys
import urllib.parse

QUERY_WINDOWSIZE = 30  # days (NID is a night id, ~1/day)
TAP_URL = 'https://irsa.ipac.caltech.edu/TAP/sync'
META_TABLE = 'ztf.ztf_current_meta_sci'

# IRSA meta columns -> ScienceImage attributes (the reference's ztfquery
# metatable columns minus imgtype/ipac_pub_date/rcid, which it deletes).
META_COLUMNS = [
    'field', 'ccdid', 'qid', 'fid', 'filtercode', 'imgtypecode',
    'filefracday', 'obsjd', 'infobits', 'pid', 'nid', 'expid', 'seeing',
    'airmass', 'moonillf', 'moonesb', 'maglimit', 'crpix1', 'crpix2',
    'crval1', 'crval2', 'cd11', 'cd12', 'cd21', 'cd22', 'ra', 'dec',
    'ra1', 'dec1', 'ra2', 'dec2', 'ra3', 'dec3', 'ra4', 'dec4',
    'ipac_gid', 'exptime',
]
_INT_COLS = {'field', 'ccdid', 'qid', 'fid', 'filefracday', 'infobits',
             'pid', 'nid', 'expid', 'ipac_gid'}
_STR_COLS = {'filtercode', 'imgtypecode'}


def build_query(nid_lo, nid_hi):
    """ADQL for one NID window (public+partnership data: IPAC_GID > 0),
    mirroring the reference's per-window sql_query
    (scripts/update.py:44-50)."""
    cols = ', '.join(META_COLUMNS)
    return (f'SELECT {cols} FROM {META_TABLE} '
            f'WHERE nid >= {int(nid_lo)} AND nid <= {int(nid_hi)} '
            f'AND ipac_gid > 0')


def fetch_metatable(nid_lo, nid_hi, auth=None):
    """Run the TAP query over HTTP, returning the CSV response text."""
    import requests
    params = {'QUERY': build_query(nid_lo, nid_hi), 'FORMAT': 'CSV'}
    url = TAP_URL + '?' + urllib.parse.urlencode(params)
    resp = requests.get(url, auth=auth, timeout=300)
    resp.raise_for_status()
    return resp.text


def parse_metatable(csv_text):
    """Parse a TAP CSV response into typed row dicts keyed by META_COLUMNS."""
    rows = []
    reader = csv.DictReader(io.StringIO(csv_text))
    for raw in reader:
        row = {}
        for col in META_COLUMNS:
            val = raw.get(col)
            if val is None or val == '' or val.lower() == 'null':
                row[col] = None
            elif col in _STR_COLS:
                row[col] = val.strip()
            elif col in _INT_COLS:
                row[col] = int(float(val))
            else:
                row[col] = float(val)
        rows.append(row)
    return rows


def _ipac_basename(row, suffix='sciimg.fits'):
    """IPAC product basename from a metadata row (the reference derives it
    through ScienceImage.ipac_path, scripts/update.py:76-85)."""
    sffd = str(row['filefracday'])
    return (f'ztf_{sffd}_{row["field"]:06d}_{row["filtercode"]}_c'
            f'{row["ccdid"]:02d}_{row["imgtypecode"]}_q{row["qid"]}_'
            f'{suffix}')


def rows_to_records(rows):
    """Build (sci, mask) ZTFFile record pairs from parsed metadata rows.

    The full metadata row rides in the header JSON with the same IPAC
    header keywords ``ScienceImage.from_file`` reflects
    (zuds_tpu/image.py:335-344), so a later pixel download hydrates into an
    identical record."""
    import json
    from zuds_tpu.core import ZTFFile
    hdr_keys = {
        'obsjd': 'OBSJD', 'infobits': 'INFOBITS', 'pid': 'DBPID',
        'nid': 'DBNID', 'expid': 'DBEXPID', 'seeing': 'SEEING',
        'airmass': 'AIRMASS', 'moonillf': 'MOONILLF', 'moonesb': 'MOONESB',
        'maglimit': 'MAGLIM', 'crpix1': 'CRPIX1', 'crpix2': 'CRPIX2',
        'crval1': 'CRVAL1', 'crval2': 'CRVAL2', 'cd11': 'CD1_1',
        'cd12': 'CD1_2', 'cd21': 'CD2_1', 'cd22': 'CD2_2',
        'ipac_gid': 'PROGRMID', 'exptime': 'EXPTIME', 'field': 'FIELDID',
        'ccdid': 'CCDID', 'qid': 'QID', 'fid': 'FILTERID',
    }
    pairs = []
    for row in rows:
        base = _ipac_basename(row)
        hdr = {kw: row[col] for col, kw in hdr_keys.items()
               if row.get(col) is not None}
        hdr['FILENAME'] = base
        common = {k: row[k] for k in
                  ('field', 'ccdid', 'qid', 'fid', 'ra', 'dec', 'ra1',
                   'dec1', 'ra2', 'dec2', 'ra3', 'dec3', 'ra4', 'dec4')}
        sci = ZTFFile(type='sci', basename=base, header=json.dumps(hdr),
                      seeing=row.get('seeing'), maglimit=row.get('maglimit'),
                      obsjd=row.get('obsjd'), infobits=row.get('infobits'),
                      **common)
        mask = ZTFFile(type='mask', **common,
                       basename=base.replace('sciimg', 'mskimg'))
        pairs.append((sci, mask))
    return pairs


def sync(fetch=fetch_metatable, auth=None, now_jd=None):
    """Reflect new IRSA metadata into the DB; returns #images inserted.

    ``fetch`` is injectable so tests can supply canned CSV responses."""
    import json
    from zuds_tpu.core import DBSession, ZTFFile

    session = DBSession()
    sm = session.query(ZTFFile).filter_by(type='sci') \
        .order_by('obsjd DESC').first()
    if sm is None or sm.obsjd is None:
        # survey start sentinel values (reference scripts/update.py:27-29)
        max_jd, max_nid = 2458165.6030208, 411
    else:
        max_jd = sm.obsjd
        try:
            max_nid = int(json.loads(sm.header or '{}').get('DBNID', 411))
        except (ValueError, TypeError):
            max_nid = 411

    if now_jd is None:
        import time
        now_jd = time.time() / 86400.0 + 2440587.5
    n_chunks = int((now_jd - max_jd) // QUERY_WINDOWSIZE) + 1

    rows = []
    for i in range(n_chunks):
        nid_lo = max_nid + i * QUERY_WINDOWSIZE
        nid_hi = max_nid + (i + 1) * QUERY_WINDOWSIZE
        rows.extend(parse_metatable(fetch(nid_lo, nid_hi, auth=auth)))
    print(f'pulled {len(rows)} images', flush=True)

    existing = {r.basename for r in
                session.query(ZTFFile).filter_by(type='sci').all()}

    inserted = []
    for sci, mask in rows_to_records(rows):
        if sci.basename in existing:
            continue
        # boundary nights can be fetched in two inclusive NID windows;
        # track inserts so the second window can't re-insert them
        existing.add(sci.basename)
        session.add(sci)
        session.add(mask)
        inserted.append((sci, mask))
    session.commit()
    # ids exist after the first commit: link each mask to its parent sci
    for sci, mask in inserted:
        mask.parent_id = sci.id
        session.add(mask)
    if inserted:
        session.commit()
    print(f'inserted {len(inserted)} new images', flush=True)
    return len(inserted)


def main(start_date=None):
    import zuds_tpu as zuds
    from zuds_tpu.secrets import get_secret
    user = get_secret('ipac_username')
    if not user:
        print('update: ipac credentials not configured; nothing to do',
              file=sys.stderr)
        return 0
    try:
        import requests  # noqa: F401
    except ImportError:
        print('update: requests not available; install to enable IRSA '
              'metadata sync', file=sys.stderr)
        return 0
    zuds.init_db()
    return sync(auth=(user, get_secret('ipac_password')))


if __name__ == '__main__':
    main(*sys.argv[1:])
