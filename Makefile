.PHONY: test bench native smoke clean

test:
	python -m pytest tests/ -q

bench:
	python bench.py

native:
	$(MAKE) -C native

smoke:
	python -m gator_tpu.cli.train --cfg configs/gator_synthetic_smoke.yml \
	    --synthetic --epochs 1

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
