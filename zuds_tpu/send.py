"""Alert publication (reference: zuds/send.py).

``send_alert`` serializes the packet with the standalone Avro encoder
(``zuds_tpu/avro.py``) and produces to Kafka when a client is available;
otherwise it writes the container file to the alert spool directory so a
relay can ship it (network-gated degradation, same policy as the other
external services).
"""
from __future__ import annotations

import datetime
import os

from .avro import write_avro
from .secrets import get_secret

__all__ = ['send_alert', 'combine_schemas', 'ALERT_SCHEMA']

# Alert schema: same structural contract as the reference's nested avsc
# trees (zuds/alert_schemas/schema_{single,stack}/): top-level alert
# envelope (9 fields) + full 123/124-field candidate record + light-curve
# array + gzip-FITS cutouts. The candidate field registry lives in
# zuds_tpu/alert_fields.py.
from .alert_fields import (CANDIDATE_FIELDS_SINGLE, CANDIDATE_FIELDS_STACK,
                           candidate_fields)

_NFLOAT = ['null', 'double']
_NINT = ['null', 'long']
_NSTR = ['null', 'string']

# kept for back-compat imports; the single-stream registry is canonical
CANDIDATE_FIELDS = CANDIDATE_FIELDS_SINGLE


def _record(name, fields):
    out = []
    for n, t in fields:
        f = {'name': n, 'type': t}
        if isinstance(t, list) and 'null' in t:
            f['default'] = None
        out.append(f)
    return {'type': 'record', 'name': name, 'fields': out}


def combine_schemas(schema_files=None, alert_type='single'):
    """Assemble the nested alert schema for one stream (reference
    zuds/send.py:20-41 reads + combines avsc files; here the schema is
    built programmatically from the field registry)."""
    candidate = _record(f'candidate_{alert_type}',
                        candidate_fields(alert_type))
    prv = _record('prv_candidate', [
        ('jd', _NFLOAT), ('ra', _NFLOAT), ('dec', _NFLOAT),
        ('flux', _NFLOAT), ('fluxerr', _NFLOAT), ('rb', _NFLOAT),
        ('snr', _NFLOAT)])
    lc = _record('phot_point', [
        ('jd', _NFLOAT), ('filter', _NSTR), ('zp', _NFLOAT),
        ('flux', _NFLOAT), ('fluxerr', _NFLOAT), ('flags', _NINT)])
    return {
        'type': 'record', 'name': 'alert', 'namespace': 'zuds_tpu',
        'fields': [
            {'name': 'schemavsn', 'type': _NSTR, 'default': None},
            {'name': 'publisher', 'type': _NSTR, 'default': None},
            {'name': 'objectId', 'type': _NSTR, 'default': None},
            {'name': 'candid', 'type': _NINT, 'default': None},
            {'name': 'candidate', 'type': candidate},
            {'name': 'prv_candidates',
             'type': ['null', {'type': 'array', 'items': prv}],
             'default': None},
            {'name': 'light_curve',
             'type': ['null', {'type': 'array', 'items': lc}],
             'default': None},
            {'name': 'cutoutScience', 'type': ['null', 'bytes'],
             'default': None},
            {'name': 'cutoutTemplate', 'type': ['null', 'bytes'],
             'default': None},
            {'name': 'cutoutDifference', 'type': ['null', 'bytes'],
             'default': None},
        ],
    }


ALERT_SCHEMA = combine_schemas()
ALERT_SCHEMA_STACK = combine_schemas(alert_type='stack')


def alert_to_record(alert):
    """(record, schema) pair for one Alert, stream chosen from the
    candidate's alert_type."""
    from .alert_fields import candidate_defaults
    payload = alert.payload or {}
    cand = payload.get('candidate', {})
    atype = cand.get('alert_type') or 'single'
    base = candidate_defaults(atype)
    base.update({k: cand[k] for k in base if k in cand})
    record = {
        'schemavsn': '0.4',
        'publisher': 'ZUDS-TPU',
        'objectId': payload.get('objectId'),
        'candid': payload.get('candid'),
        'candidate': base,
        'prv_candidates': payload.get('prv_candidates'),
        'light_curve': payload.get('light_curve'),
        'cutoutScience': alert.cutout_science,
        'cutoutTemplate': alert.cutout_template,
        'cutoutDifference': alert.cutout_difference,
    }
    schema = ALERT_SCHEMA_STACK if atype == 'stack' else ALERT_SCHEMA
    return record, schema


def send_alert(alert, stack=False):
    """Serialize + publish one alert (reference: zuds/send.py:43-101).

    Topic naming follows the reference:
    ``ztf_<YYYYMMDD>_programid2_zuds[_stack]``. Without a Kafka client the
    packet is spooled to ``<base_data_directory>/alerts/<topic>/``.
    """
    date = datetime.datetime.utcnow().strftime('%Y%m%d')
    record, schema = alert_to_record(alert)
    stack = stack or record['candidate'].get('alert_type') == 'stack'
    topic = f'ztf_{date}_programid2_zuds' + ('_stack' if stack else '')

    try:
        from confluent_kafka import Producer  # pragma: no cover
    except ImportError:
        Producer = None

    if Producer is not None and get_secret('kafka_brokers'):
        import io
        buf = io.BytesIO()
        write_avro(buf, schema, [record])
        p = Producer({'bootstrap.servers': get_secret('kafka_brokers')})
        p.produce(topic=topic, value=buf.getvalue())
        p.flush()
    else:
        spool = os.path.join(
            os.path.expanduser(str(get_secret('base_data_directory',
                                              '/tmp/zuds-tpu-data'))),
            'alerts', topic)
        os.makedirs(spool, exist_ok=True)
        path = os.path.join(spool, f'{record["candid"] or "alert"}.avro')
        write_avro(path, schema, [record])

    alert.sent = 1
    from .core import DBSession
    sess = DBSession()
    if sess.conn is not None:
        sess.add(alert)
        sess.commit()
    return topic
