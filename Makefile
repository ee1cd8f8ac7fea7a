.PHONY: test test-full gate bench-smoke bench bench-pool bench-pool-grouped bench-serve soak soak-device accuracy plan dryrun release-check

# Fast dev tier (~2 min: heavy differentials deselected by pyproject
# addopts). `make test-full` is the pre-land gate (~7 min, everything
# except the wall-clock soak).
test:
	python -m pytest tests/ -q

test-full:
	python -m pytest tests/ -q -m 'not soak'

gate:
	python scripts/check_hot_path.py

bench-smoke:
	python bench.py --smoke

bench:
	python bench.py

bench-pool:
	python bench.py --pool

bench-pool-grouped:
	python bench.py --pool --pool-groups 4 --deadline 1200

bench-serve:
	python bench.py --serve

soak:
	python -m pytest -m soak tests/test_soak.py -q -s

soak-device:
	python scripts/soak_device.py --seconds 300
	python scripts/soak_device.py --seconds 300 --pool-blocks 8

accuracy:
	python scripts/validate_accuracy.py
	python scripts/validate_accuracy.py --pool
	python scripts/validate_accuracy.py --pool --pool-groups 2
	python scripts/validate_accuracy.py --blocks-per-step 8

plan:
	python scripts/plan_capacity.py

dryrun:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	python -c "import jax; jax.config.update('jax_platforms','cpu'); \
	import __graft_entry__ as e; e.dryrun_multichip(8); print('ok')"

# The release workflow's local dress rehearsal (no tagging/publishing).
release-check:
	python scripts/validate_release_version.py 999.0.0 "" --skip-metadata
	python -m pytest tests/ -q -m 'not soak'
	python scripts/check_hot_path.py
	python bench.py --smoke --strict
	python bench.py --smoke --pool --strict
	python bench.py --smoke --pool --pool-groups 4 --strict
	python bench.py --smoke --serve --strict
	$(MAKE) dryrun
