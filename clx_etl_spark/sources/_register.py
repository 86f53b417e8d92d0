"""Thread-safe, per-session-idempotent Python DSv2 registration.

``spark.dataSource.register`` is a JVM map mutation: two driver threads
registering the same source name concurrently race inside
``registerPython`` (observed as an AnalysisException under the r13
driver-thread fan-out that builds all registry queries in parallel), and
re-registering on every query build is wasted py4j traffic besides. All
engine registration sites funnel through here; the lock serializes the
rare first registration and every later call is a set lookup.
"""

from __future__ import annotations

import threading

_LOCK = threading.Lock()
_DONE: set[tuple[int, str]] = set()


def register_datasource_once(spark, cls) -> None:
    try:
        name = cls.name()
    except Exception:
        name = cls.__name__
    key = (id(spark), name)
    if key in _DONE:
        return
    with _LOCK:
        if key in _DONE:
            return
        spark.dataSource.register(cls)
        _DONE.add(key)
