.PHONY: test package bench scaling oracle

test:
	python -m pytest tests/ -x -q

package:
	rm -f engine.zip
	zip -qr engine.zip harvester_fgp_spark -x '*__pycache__*'
	@echo "spark-submit --py-files engine.zip jobs/run_pipeline.py ..."

bench:
	python bench.py

scaling:
	python bench/bench_scaling.py

oracle:
	python tools/check_oracle.py
