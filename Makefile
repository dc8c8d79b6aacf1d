# Convenience targets. Tests run on a virtual 8-device CPU mesh;
# bench needs the TPU chip.

.PHONY: test test-fast bench native smoke multichip accuracy

test:
	PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m pytest tests/ -q

test-fast:
	PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m pytest tests/ -q \
		--ignore=tests/test_models_cls.py --ignore=tests/test_models_seg.py \
		--ignore=tests/test_kpconv.py

bench:
	python bench.py

native:
	python -c "from pointcloudlib_tpu import native; assert native.build(force=True); print('native lib built')"

smoke:
	python train_cls.py --model pointnet --synthetic --epochs 1 \
		--steps-per-epoch 2 --batch_size 8 --num_points 256 --synthetic-size 32

multichip:
	python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

accuracy:
	python scripts/accuracy_ladder.py
