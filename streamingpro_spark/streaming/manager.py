"""Stream lifecycle manager + event callbacks.

Reference: streaming/core/stream/MLSQLStreamManager.scala —
MLSQLStreamingQueryListener syncs query id ↔ job registry and fires
started/progress/terminated HTTP callbacks (:123-221); `!callback post
url when "started,progress,terminated"` registers targets
(CommandCollection.scala:81-85).
"""

from __future__ import annotations

import json
from typing import TYPE_CHECKING, Callable

from pyspark.sql.streaming import StreamingQueryListener

if TYPE_CHECKING:
    from pyspark.sql import SparkSession


class StreamCallbackListener(StreamingQueryListener):
    """Fires registered callbacks on stream lifecycle events."""

    def __init__(self) -> None:
        self.callbacks: dict[str, list[Callable[[dict], None]]] = {
            "started": [], "progress": [], "terminated": []}

    def add_callback(self, events: str, fn: Callable[[dict], None]) -> None:
        for ev in events.split(","):
            ev = ev.strip()
            if ev in self.callbacks:
                self.callbacks[ev].append(fn)

    def _fire(self, event: str, payload: dict) -> None:
        for fn in self.callbacks[event]:
            try:
                fn(payload)
            except Exception:
                pass

    def onQueryStarted(self, event) -> None:
        self._fire("started", {"id": str(event.id), "name": event.name})

    def onQueryProgress(self, event) -> None:
        try:
            progress = json.loads(event.progress.json)
        except Exception:
            progress = {}
        self._fire("progress", progress)

    def onQueryTerminated(self, event) -> None:
        self._fire("terminated", {"id": str(event.id)})


def http_callback(url: str) -> Callable[[dict], None]:
    """POST the event payload to `url` (the reference's HTTP callback)."""
    def post(payload: dict) -> None:
        import urllib.request
        req = urllib.request.Request(
            url, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        urllib.request.urlopen(req, timeout=5)  # noqa: S310
    return post


_LISTENERS: dict[int, StreamCallbackListener] = {}


def get_listener(spark: "SparkSession") -> StreamCallbackListener:
    key = id(spark)
    if key not in _LISTENERS:
        listener = StreamCallbackListener()
        spark.streams.addListener(listener)
        _LISTENERS[key] = listener
    return _LISTENERS[key]
