#!/bin/bash
# Regenerate the full reference-oracle convergence A/B evidence
# (round-3 verdict item 4: the round-3 artifacts lived in gitignored
# results/ and did not survive; everything now lands in evidence/).
#
# Torch side runs on CPU (nice'd, ~2.5-3.5 h for all seeds on this
# box's single core); JAX side follows. Run from /root/repo:
#   nohup bash scripts/run_oracle_ab.sh > /tmp/oracle_ab.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p results/oracle_data evidence/oracle

if [ ! -f results/oracle_data/darcy_train.mat ]; then
    nice -n 19 python -m oracle.export_data --out results/oracle_data
fi

for seed in 0 1 2; do
    for proto in uai3 mgkn_orthogonal mgkn_general; do
        out=evidence/oracle/${proto}_torch_s${seed}.json
        [ -f "$out" ] && continue
        echo "=== torch $proto seed $seed ($(date +%H:%M:%S))"
        nice -n 19 python -m oracle.run_${proto} \
            --data results/oracle_data --seed $seed --out "$out" \
            || echo "FAILED torch $proto s$seed"
    done
done
echo "torch side done ($(date +%H:%M:%S))"
