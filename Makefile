.PHONY: test test-oracle test-streaming bench example lint

test:
	python -m pytest tests/ -q

test-oracle:
	python -m pytest tests/test_queries_oracle.py -q

test-streaming:
	python -m pytest tests/test_streaming.py -q

bench:
	python bench.py

example:
	python examples/file_connector.py
	python examples/llm_pipeline.py
	python examples/event_analytics.py

lint:
	python -m compileall -q pyconnect_spark tests bench.py __spark_entry__.py
