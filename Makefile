# Developer entry points. TPU targets assume the default (tunneled) env;
# CPU targets force the local backend.

CPU_ENV = env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
          XLA_FLAGS=--xla_force_host_platform_device_count=8

.PHONY: test native bench bench-kernels preprocess dryrun clean

test:
	python -m pytest tests/ -x -q

native:
	$(MAKE) -C equidock_public_tpu/native

preprocess:
	$(CPU_ENV) python -m equidock_public_tpu.cli.preprocess -data db5

bench:
	python bench.py

bench-kernels:
	python bench_kernels.py

dryrun:
	$(CPU_ENV) python __graft_entry__.py

clean:
	rm -rf cache checkpts stdouterr tb_logs jax_cache profile
	$(MAKE) -C equidock_public_tpu/native clean
