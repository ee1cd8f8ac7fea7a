.PHONY: test gate bench-smoke bench dryrun

test:
	python -m pytest tests/ -q

gate:
	python scripts/check_hot_path.py

bench-smoke:
	python bench.py --smoke

bench:
	python bench.py

dryrun:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	python -c "import jax; jax.config.update('jax_platforms','cpu'); \
	import __graft_entry__ as e; e.dryrun_multichip(8); print('ok')"
