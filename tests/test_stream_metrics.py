"""StreamingQueryListener health metrics (T6): progress events captured
per micro-batch, row counts accounted, health verdict derived."""

from __future__ import annotations

import json
import time

from caseguarddatapipeline_spark.streaming.metrics import (
    attach_health_listener,
    detach,
)
from caseguarddatapipeline_spark.streaming.stateful import run_watermark_stream


def test_health_listener_accounts_rows(spark, tmp_path):
    events = tmp_path / "events"
    events.mkdir()
    rows = [{"entity_id": i % 3, "serialno": i} for i in range(12)]
    with open(events / "b.json", "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")

    listener = attach_health_listener(spark)
    try:
        run_watermark_stream(
            spark, str(events), str(tmp_path / "out"), str(tmp_path / "ckpt")
        )
        # listener bus delivers asynchronously; generous deadline so the
        # test stays solid on a loaded box
        deadline = time.time() + 30
        while time.time() < deadline:
            s = listener.summary()
            if s["n_batches"] >= 1 and s["total_input_rows"] >= 12:
                break
            time.sleep(0.2)
        s = listener.summary()
        assert s["n_batches"] >= 1
        assert s["total_input_rows"] == 12
        assert s["healthy"] is True
        kinds = {k for k, _, _ in listener.events}
        assert "started" in kinds and "terminated" in kinds
    finally:
        detach(spark, listener)
