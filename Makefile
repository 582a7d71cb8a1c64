.PHONY: test test-fast check-fast-budget bench native smoke parity latency pipeline scaling trainbench tracereport realdata day-one accumreport devcachebench lengthsbench clean

test:
	python -m pytest tests/ -q

test-fast:  ## commit gate (<5 min on 1 core): every module, slow parity/subprocess tests excluded
	python -m pytest tests/ -q -m "not slow"

check-fast-budget:  ## fail when the slow manifest is stale (too many unmanifested tests)
	python tools/check_fast_budget.py

bench:
	python bench.py

native:
	$(MAKE) -C native

smoke:  ## every pipeline end-to-end on synthetic data (CPU-friendly)
	python -m clip_for_dl_tpu pretrain --synthetic --tiny --fp32 --epochs 1 --log-dir /tmp/smoke
	python -m clip_for_dl_tpu adapter  --synthetic --tiny --fp32 --epochs 1 --log-dir /tmp/smoke
	python -m clip_for_dl_tpu zeroshot --synthetic --tiny --fp32 --log-dir /tmp/smoke
	python -m clip_for_dl_tpu gradcam  --synthetic --tiny --fp32 --log-dir /tmp/smoke
	python -m clip_for_dl_tpu rollout  --synthetic --tiny --fp32 --log-dir /tmp/smoke

parity:
	python tools/parity_harness.py --random-weights

latency:
	python tools/latency_bench.py

pipeline:  ## end-to-end disk→decode→H2D→TPU throughput
	python tools/host_pipeline_bench.py

scaling:  ## multi-chip roofline from partitioned HLO (virtual mesh)
	python tools/scaling_report.py

trainbench:  ## pretrain step img/s on the chip (first compile is slow)
	python tools/train_bench.py --batch-size 128 --seq-lens 200 64

tracereport:  ## per-op device-time table from a jax.profiler capture
	python tools/trace_report.py --workload zeroshot --tower resnet

realdata:  ## day-one drill: Kaggle-layout dataset + full CLI chain + schema diff
	python tools/real_data_dryrun.py

day-one:  ## one-command real-hardware bring-up: prep -> cache-images -> hub-init pretrain -> adapter -> zeroshot -> convert -> parity gate (real assets from real_assets/ or $$CLIP_FOR_DL_REAL_ASSETS; validated stand-ins otherwise)
	python tools/day_one.py

accumreport:  ## measured HBM effect of GradCache accumulation (XLA memory_analysis)
	python tools/accum_report.py --tiny

devcachebench:  ## pretrain epoch: streaming vs device-resident image feed (chip)
	python tools/device_cache_bench.py --out benchmarks/device_cache_train

lengthsbench:  ## bucketed pretrain on the REAL Indiana report lengths (chip)
	python tools/real_lengths_bench.py --out benchmarks/bucketed_pretrain

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
