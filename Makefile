# Developer entry points. The C++ host runtime builds via cpp/Makefile.

.PHONY: all native test bench smoke dryrun clean

all: native

native:
	$(MAKE) -C cpp

test: native
	python -m pytest tests/ -q

bench: native
	python bench.py

smoke:
	python tools/tpu_smoke.py

dryrun:
	XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

clean:
	$(MAKE) -C cpp clean
	find . -name __pycache__ -type d -exec rm -rf {} +
