#!/usr/bin/env python
"""Load external-catalog CSVs into the local crossmatch tables.

The reference enriches alerts through network services (Kowalski PS1 /
milliquas_v6 / TNS / ZTF_alerts cone searches, a private DR8 postgres —
zuds/crossmatch.py:85-383). This rebuild answers those queries from LOCAL
tables (zuds_tpu/external.py); this script bulk-loads them from CSV dumps:

    python scripts/load_catalogs.py ps1 ps1_dump.csv
    python scripts/load_catalogs.py milliquas milliquas.csv
    python scripts/load_catalogs.py tns tns.csv
    python scripts/load_catalogs.py ztf_names names.csv
    python scripts/load_catalogs.py clu clu.csv
    python scripts/load_catalogs.py dr8north sweep.csv

CSV columns are matched to model columns by (case-insensitive) header
name; unknown columns go into the ``extra`` JSON blob when the model has
one. Rows stream in chunks so million-row catalogs load in bounded memory.
"""
import csv
import json
import sys

CHUNK = 5000


def _models():
    from zuds_tpu import external
    return {
        'ps1': external.PS1,
        'milliquas': external.Milliquas,
        'tns': external.TNSSource,
        'ztf_names': external.ZTFName,
        'clu': external.CLU,
        'dr8north': external.DR8North,
        'dr8south': external.DR8South,
    }


def load_csv(table, path, session=None):
    """Stream ``path`` into local table ``table``. Returns rows loaded."""
    import zuds_tpu
    from zuds_tpu.core import DBSession

    model = _models()[table]
    if session is None:
        zuds_tpu.init_db()
        session = DBSession()
    cols = {c.lower(): c for c in model.__columns__}
    has_extra = 'extra' in cols
    n = 0
    with open(path, newline='') as f:
        reader = csv.DictReader(f)
        batch = []
        for row in reader:
            kw, extra = {}, {}
            for k, v in row.items():
                if v in (None, ''):
                    continue
                lk = k.strip().lower()
                if lk in cols:
                    kw[cols[lk]] = v
                else:
                    extra[k] = v
            if extra and has_extra:
                kw['extra'] = json.dumps(extra)
            batch.append(model(**kw))
            if len(batch) >= CHUNK:
                for obj in batch:
                    session.add(obj)
                session.commit()
                n += len(batch)
                batch = []
        for obj in batch:
            session.add(obj)
        session.commit()
        n += len(batch)
    print(f'loaded {n} rows into {table}', flush=True)
    return n


if __name__ == '__main__':
    if len(sys.argv) < 3 or sys.argv[1] not in _models():
        print(f'usage: load_catalogs.py {{{"|".join(_models())}}} file.csv',
              file=sys.stderr)
        sys.exit(2)
    load_csv(sys.argv[1], sys.argv[2])
