"""YAML config with secret hygiene (reference: zuds/secrets.py:21-93).

Config file resolution order:
  1. ``$ZUDS_CONFIG`` if set
  2. ``~/.zuds-tpu``
seeded from ``zuds_tpu/config/default.conf.yaml`` on first use. Files with
group- or world-readable permissions are refused, since the config holds
database and service credentials.
"""
import os
import shutil
import stat
from pathlib import Path

import yaml

__all__ = ['get_secret', 'load_config']


DEFAULT_CONFIG = Path(__file__).parent / 'config' / 'default.conf.yaml'


class SecretManager:

    def __init__(self):
        self.cache = None
        self.path = None

    def config_path(self):
        env = os.getenv('ZUDS_CONFIG')
        if env:
            return Path(env)
        return Path.home() / '.zuds-tpu'

    def initialize_config(self, path):
        path.parent.mkdir(parents=True, exist_ok=True)
        shutil.copy(DEFAULT_CONFIG, path)
        os.chmod(path, stat.S_IRUSR | stat.S_IWUSR)

    def load_config(self, reload=False):
        if self.cache is not None and not reload:
            return self.cache
        path = self.config_path()
        if not path.exists():
            self.initialize_config(path)
        mode = os.stat(path).st_mode
        if mode & (stat.S_IRGRP | stat.S_IROTH | stat.S_IWGRP | stat.S_IWOTH):
            raise PermissionError(
                f'config file {path} must not be group/world accessible; '
                f'run: chmod 600 {path}')
        with open(path) as f:
            self.cache = yaml.safe_load(f) or {}
        self.path = path
        return self.cache

    def get(self, key, default=None):
        return self.load_config().get(key, default)


_manager = SecretManager()


def load_config(reload=False):
    return _manager.load_config(reload=reload)


def get_secret(key, default=None):
    return _manager.get(key, default)
