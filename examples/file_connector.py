#!/usr/bin/env python
"""File source → file-topic → file sink roundtrip (the engine's analogue
of the reference's examples/file_source + examples/file_sink pair).

Writes a JSON-lines input file, streams it through a topic location with
checkpointed offsets, and flushes to an output JSON-lines file with
commit-after-flush semantics. Run: python examples/file_connector.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyconnect_spark.config import SinkConfig, SourceConfig
from pyconnect_spark.session import get_spark
from pyconnect_spark.streaming.sink import FileSink
from pyconnect_spark.streaming.source import SparkSource


def main() -> None:
    spark = get_spark("example-file-connector", cores=4)
    work = tempfile.mkdtemp(prefix="pyconnect-example-")
    in_dir = os.path.join(work, "in")
    topic = os.path.join(work, "topic")
    out = os.path.join(work, "out.jsonl")
    os.makedirs(in_dir)
    with open(os.path.join(in_dir, "records.jsonl"), "w") as f:
        for i in range(25):
            f.write(json.dumps({"key": f"k{i}", "value": f"v{i}"}) + "\n")

    SparkSource(
        spark,
        SourceConfig(
            bootstrap_servers="localhost:9092",  # unused by the file transport
            topic=topic,
            checkpoint_location=os.path.join(work, "src-ckpt"),
        ),
        input_dir=in_dir,
    ).run()

    sink = FileSink(
        spark,
        SinkConfig(
            bootstrap_servers="localhost:9092",
            topics=[topic],
            checkpoint_location=os.path.join(work, "sink-ckpt"),
        ),
        out_path=out,
    )
    sink.run()

    n = sum(1 for _ in open(out))
    print(f"roundtrip complete: {n} records -> {out} (status={sink.status.value})")
    spark.stop()


if __name__ == "__main__":
    main()
