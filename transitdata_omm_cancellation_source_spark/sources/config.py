"""S8/S9 — configuration and secrets source.

Reference: HOCON ``environment.conf`` with env-var overrides
(``environment.conf:1-25``) plus the DB connection string from
``TRANSITDATA_PUBTRANS_CONN_STRING`` (``Main.java:84-97``).  Here the
same surface is a plain dict with the same override variables — no
HOCON dependency.
"""

from __future__ import annotations

import os
from collections.abc import Mapping

DEFAULTS: dict[str, object] = {
    # environment.conf:9-10, 21-24
    "pulsar.producer.topic": "omm-cancellations",
    "omm.timezone": "Europe/Helsinki",
    "omm.interval_secs": 30,
    "omm.mode": "NOW",  # CancellationSourceType (Main.java:30-44)
}

ENV_OVERRIDES: dict[str, tuple[str, type]] = {
    "PULSAR_PRODUCER_TOPIC": ("pulsar.producer.topic", str),
    "OMM_TIMEZONE": ("omm.timezone", str),
    "POLLER_INTERVAL_SECS": ("omm.interval_secs", int),
    "CANCELLATIONS_FROM_TIME": ("omm.mode", str),
}

VALID_MODES = ("NOW", "PAST")  # CancellationSourceType.java:3-22

CONNECTION_STRING_ENV = "TRANSITDATA_PUBTRANS_CONN_STRING"


def load_config(env: Mapping[str, str] | None = None) -> dict[str, object]:
    """Defaults overridden by environment, mode validated.

    An invalid mode raises ValueError — the reference exits with
    status 1 (``Main.java:41-43``); callers decide whether to die.
    """
    env = os.environ if env is None else env
    cfg = dict(DEFAULTS)
    for var, (key, cast) in ENV_OVERRIDES.items():
        if var in env:
            cfg[key] = cast(env[var])
    mode = str(cfg["omm.mode"]).upper()
    if mode not in VALID_MODES:
        raise ValueError(f"invalid omm.mode {cfg['omm.mode']!r}; expected {VALID_MODES}")
    cfg["omm.mode"] = mode
    return cfg


def connection_string(env: Mapping[str, str] | None = None) -> str | None:
    """S9 — the JDBC connection string, or None when unset."""
    env = os.environ if env is None else env
    value = env.get(CONNECTION_STRING_ENV, "").strip()
    return value or None
