"""Custom Python streaming data source (Spark 4 DataSource API).

Exact parity with the reference's pluggable source contract
(/root/reference/src/pyconnect/pyconnectsource.py:129-161, 240-250):

| reference                      | here                                   |
|--------------------------------|----------------------------------------|
| ``read() -> (key, value)``     | ``read(start)`` yields record tuples   |
| ``get_index() -> Any``         | the offset dict returned by ``read``   |
| ``seek(index)``                | ``readBetweenOffsets(start, end)``     |
| offset topic + high-watermark  | streaming checkpoint offset log        |
| ``StopIteration`` at EOF       | ``read`` returns an empty batch        |

``RecordStreamDataSource`` is a deterministic generator source
(``key_i``/``value_i`` records, paced by ``batch_size``) that exercises
the full offset/replay machinery; subclass and override
:meth:`RecordStreamReader.fetch` to plug any external system — the
offset bookkeeping and replay semantics are inherited.

Registration::

    spark.dataSource.register(RecordStreamDataSource)
    df = (spark.readStream.format("pyconnect_records")
          .option("n_records", 100).option("batch_size", 10).load())
"""

from __future__ import annotations

from typing import Tuple

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import StructType


class RecordStreamReader(SimpleDataSourceStreamReader):
    """Offset-tracked record reader. Offsets are ``{"idx": n}`` — the
    analogue of the reference's opaque ``get_index()`` value, persisted by
    Spark's checkpoint instead of a Kafka offset topic."""

    def __init__(self, options):
        self.n_records = int(options.get("n_records", 100))
        self.batch_size = int(options.get("batch_size", 10))

    # -- the pluggable part (reference: PyConnectSource.read) --
    def fetch(self, start_idx: int, end_idx: int) -> list[Tuple[str, str]]:
        # must be a concrete (picklable) batch — Spark ships it to executors
        return [(f"key_{i}", f"value_{i}") for i in range(start_idx, end_idx)]

    # -- offset machinery (reference: get_index/seek/_commit) --
    def initialOffset(self) -> dict:
        return {"idx": 0}

    def read(self, start: dict):
        start_idx = start["idx"]
        end_idx = min(start_idx + self.batch_size, self.n_records)
        # iter(list): Spark requires an iterator AND pickles it for replay
        # caching — a list_iterator is both (a generator pickles not at all)
        return iter(self.fetch(start_idx, end_idx)), {"idx": end_idx}

    def readBetweenOffsets(self, start: dict, end: dict):
        # replay after failure — the reference's seek(index) + re-read
        return iter(self.fetch(start["idx"], end["idx"]))


class RecordStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "pyconnect_records"

    def schema(self) -> str:
        return "key string, value string"

    def simpleStreamReader(self, schema: StructType):
        return RecordStreamReader(self.options)
