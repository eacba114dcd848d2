# Top-level task runner.

.PHONY: all native test bench smoke clean

all: native

native:
	$(MAKE) -C native/fmm
	$(MAKE) -C native/simcore

test:
	python -m pytest tests/ -q

bench:
	python bench.py

# end-to-end smoke on the virtual CPU mesh (no TPU needed)
smoke:
	JAX_PLATFORM_NAME=cpu JAX_PLATFORMS=cpu \
	XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	python __graft_entry__.py

clean:
	$(MAKE) -C native/fmm clean
	$(MAKE) -C native/simcore clean
