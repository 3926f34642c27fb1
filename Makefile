.PHONY: test test-full bench native smoke clean

# quick lane: skips the multi-minute runs (marker: slow)
test:
	python -m pytest tests/ -q -m "not slow"

# full suite (what the driver/judge runs)
test-full:
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
