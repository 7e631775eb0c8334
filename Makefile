.PHONY: test test-oracle test-streaming test-kafka kafka-up kafka-down bench example lint window-audit preflight

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

# Plan-only audit: no declared query may carry an unpartitioned
# Window/WindowGroupLimit (whole-frame single-task sort). Exit 1 on any.
window-audit:
	python tools/window_audit.py

# The round-close gate: full strict sweep (default + alternate
# partitioning) + window audit + the driver-window dry run, each teed to
# a round-stamped artifact so the evidence lands in the SAME commit as
# the last query change (round-5 verdict task #7: no more late additions
# shipping after the sweep artifact was cut). Usage: make preflight R=r06
R ?= rXX
preflight:
	python tools/strict_sweep.py | tee STRICT_SWEEP_$(R).txt
	SWEEP_CORES=5 SWEEP_PARTITIONS=7 python tools/strict_sweep.py \
	  | tee STRICT_SWEEP_$(R)_altpartitioning.txt
	python tools/window_audit.py | tee WINDOW_AUDIT_$(R).txt
	python tools/window_check.py

bench:
	python bench.py

example:
	python examples/file_connector.py
	python examples/llm_pipeline.py
	python examples/event_analytics.py
	python examples/dedup_at_scale.py
	python examples/table_maintenance.py

lint:
	python -m compileall -q pyconnect_spark tests bench.py __spark_entry__.py
