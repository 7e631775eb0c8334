.PHONY: test test-oracle test-streaming test-kafka kafka-up kafka-down bench example lint

# Live-broker integration suites (skip cleanly without a broker).
# Bring up Kafka + Schema Registry with `make kafka-up` (needs docker),
# then `make test-kafka` runs the env-gated suites against them.
kafka-up:
	docker compose up -d --wait

kafka-down:
	docker compose down -v

test-kafka:
	PYCONNECT_KAFKA_BOOTSTRAP=localhost:9092 \
	PYCONNECT_SCHEMA_REGISTRY=http://localhost:8081 \
	python -m pytest tests/test_kafka_integration.py tests/test_schema_registry.py -q

test:
	python -m pytest tests/ -q

test-oracle:
	python -m pytest tests/test_queries_oracle.py -q

test-streaming:
	python -m pytest tests/test_streaming.py -q

# Driver-style strict sweep of every query vs its DuckDB oracle, then the
# same sweep under a DIFFERENT core/partition count — catches results that
# depend on partitioning (unpinned collect_list order etc.).
sweep:
	python tools/strict_sweep.py
	SWEEP_CORES=5 SWEEP_PARTITIONS=7 python tools/strict_sweep.py

# Executed-plan shuffle/spill volumes for every headline query.
shuffle-ledger:
	python tools/shuffle_ledger.py > docs/SHUFFLE_LEDGER.md

bench:
	python bench.py

example:
	python examples/file_connector.py
	python examples/llm_pipeline.py
	python examples/event_analytics.py
	python examples/dedup_at_scale.py

lint:
	python -m compileall -q pyconnect_spark tests bench.py __spark_entry__.py
