#!/bin/bash
# Round-5 planner-bias B/K-dependence probe (VERDICT r4 item 4).
#
# The round-4 width calibration measured the _chunk_vmem_bytes live-rows
# bias at ONE batch size (B=100) and ONE grid length (K=2004); _fits_chunk
# scales the bias by _pad8(B) — an assumption, never probed. Each arm
# below forces an exact CK through force_plan=('chunk', CK) (budget checks
# skipped) and harvests the ACTUAL scoped-VMEM size from Mosaic's
# rejection message. Discriminating predictions (est from
# _chunk_vmem_bytes; bias_B-prop = _live_rows(fit) * pad8(B) * lane * 4;
# bias_const = the B=100 measured bytes):
#
#   w=400 B=200 CK=8 : est 15.44M; actual ~26.9M if B-prop, ~21.3M if const
#   w=200 B=200 CK=16: est 18.63M; actual ~19.8M if B-prop, ~19.2M if const
#   w=100 B=200 CK=16: est 17.34M; COMPILES if B-prop (-2.1M), REJECTS
#                      at ~16.3M if const (-1.0M)  <- sharpest arm
#   w=50  B=200 CK=16: est 16.95M; compiles either way (borderline const)
#   w=400 B=100 K=1000 CK=16: est 15.24M; actual ~21.4M if the bias is
#                      K-independent (chunked layout predicts it is)
#
# Run serially (ONE chip): bash scripts/b_probe.sh 2>&1 | tee /tmp/b_probe.log
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

NJODE_PROBE_B=200 NJODE_PROBE_CKS=16,24 python scripts/wide_plan_probe.py widths 50 100
NJODE_PROBE_B=200 NJODE_PROBE_CKS=16 python scripts/wide_plan_probe.py widths 200
NJODE_PROBE_B=200 NJODE_PROBE_CKS=8 python scripts/wide_plan_probe.py widths 400
NJODE_PROBE_K=1000 NJODE_PROBE_CKS=16 python scripts/wide_plan_probe.py widths 400
