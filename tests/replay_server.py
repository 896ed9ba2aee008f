"""Compatibility shim: the replay server moved into the package
(sources/replay_server.py) so bench.py's --streaming mode can drive it;
tests keep importing it from here."""

from myzql_binlog_connector_ray.sources.replay_server import (  # noqa: F401
    EOF,
    OK,
    SEED,
    ReplayServer,
    _gen_rsa_keypair,
    _rsa_key,
    fake_rotate_frame,
    iter_raw_frames,
)
