# Developer entry points (the reference's Makefile rebuilt: build/tests/bench,
# /root/reference/Makefile:1-25; iOS target replaced by the native lib build).

.PHONY: test native bench clean export lint

test:
	python -m pytest tests/ -x -q

native:
	cmake -S native -B native/build -G Ninja
	cmake --build native/build

bench:
	python bench.py

bench-serving:
	python scripts/bench_serving.py --tiny --cpu --duration-s 10

bench-conv:
	python scripts/bench_conv_variants.py

profile:
	python scripts/profile_stages.py

export:
	python scripts/export_vits.py

clean:
	rm -rf native/build .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
