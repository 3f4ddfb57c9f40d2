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

# Alert schema: same structural contract as the reference's nested avsc pair
# (zuds/alert_schemas/*): top-level alert envelope + candidate record +
# light-curve array + gzip-FITS cutouts.
_NFLOAT = ['null', 'double']
_NINT = ['null', 'long']
_NSTR = ['null', 'string']

CANDIDATE_FIELDS = [
    ('jd', _NFLOAT), ('ra', _NFLOAT), ('dec', _NFLOAT), ('fid', _NINT),
    ('magpsf', _NFLOAT), ('sigmapsf', _NFLOAT), ('fwhm', _NFLOAT),
    ('elong', _NFLOAT), ('aimage', _NFLOAT), ('bimage', _NFLOAT),
    ('flux', _NFLOAT), ('fluxerr', _NFLOAT), ('snr', _NFLOAT),
    ('rb', _NFLOAT), ('rbversion', _NSTR), ('xpos', _NFLOAT),
    ('ypos', _NFLOAT), ('flags_weight', _NINT), ('imaflags_iso', _NINT),
    ('magzpsci', _NFLOAT), ('field', _NINT), ('programid', _NINT),
]


def _record(name, fields):
    return {'type': 'record', 'name': name,
            'fields': [{'name': n, 'type': t, 'default': None}
                       for n, t in fields]}


def combine_schemas(schema_files=None):
    """Assemble the nested alert schema (reference zuds/send.py:20-41 reads
    avsc files; here the schema is built programmatically)."""
    candidate = _record('candidate', CANDIDATE_FIELDS)
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


def alert_to_record(alert):
    payload = alert.payload or {}
    cand = payload.get('candidate', {})
    record = {
        'objectId': payload.get('objectId'),
        'candid': payload.get('candid'),
        'candidate': {n: cand.get(n) for n, _ in CANDIDATE_FIELDS},
        'prv_candidates': payload.get('prv_candidates'),
        'light_curve': payload.get('light_curve'),
        'cutoutScience': alert.cutout_science,
        'cutoutTemplate': alert.cutout_template,
        'cutoutDifference': alert.cutout_difference,
    }
    return record


def send_alert(alert, stack=False):
    """Serialize + publish one alert (reference: zuds/send.py:43-101).

    Topic naming follows the reference:
    ``ztf_<YYYYMMDD>_programid2_zuds[_stack]``. Without a Kafka client the
    packet is spooled to ``<base_data_directory>/alerts/<topic>/``.
    """
    date = datetime.datetime.utcnow().strftime('%Y%m%d')
    topic = f'ztf_{date}_programid2_zuds' + ('_stack' if stack else '')
    record = alert_to_record(alert)

    try:
        from confluent_kafka import Producer  # pragma: no cover
    except ImportError:
        Producer = None

    if Producer is not None and get_secret('kafka_brokers'):
        import io
        buf = io.BytesIO()
        write_avro(buf, ALERT_SCHEMA, [record])
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
        write_avro(path, ALERT_SCHEMA, [record])

    alert.sent = 1
    from .core import DBSession
    sess = DBSession()
    if sess.conn is not None:
        sess.add(alert)
        sess.commit()
    return topic
