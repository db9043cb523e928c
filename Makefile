# Common targets. The TPU targets need the attached chip; everything
# else runs on CPU (the conftest pins the platform and enables x64).

.PHONY: test golden tpu-check bench dryrun soak

test:
	python -m pytest tests/ -q

golden:
	python scripts/golden_check.py

tpu-check:
	python scripts/tpu_check.py

bench:
	python bench.py

dryrun:
	XLA_FLAGS=--xla_force_host_platform_device_count=8 python -c \
	  "import jax; jax.config.update('jax_platforms', 'cpu'); \
	   import __graft_entry__ as e; e.dryrun_multichip(8)"
