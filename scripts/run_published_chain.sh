#!/bin/bash
# Round-5: run every remaining published-scale block serially on the one
# chip (VERDICT r4 item 5), one log per block, stop-on-nothing — a failed
# block must not starve the rest. Order: cheap synthetic blocks first,
# the two real-data harnesses last (largest).
#   bash scripts/run_published_chain.sh   # takes hours; run_in_background
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
for block in heston combined sine gob climate physionet; do
  echo "=== BLOCK $block start $(date -Is)" | tee -a /tmp/published_chain.log
  python scripts/published_blocks.py "$block" \
    > "/tmp/published_${block}.log" 2>&1
  echo "=== BLOCK $block exit=$? end $(date -Is)" | tee -a /tmp/published_chain.log
done
echo "CHAIN DONE $(date -Is)" | tee -a /tmp/published_chain.log
