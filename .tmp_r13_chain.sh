#!/bin/bash
set -x
cd /root/repo
echo "=== STAGE 1: boiler skew soak + special ===" 
python tools/skew_soak.py --out CROSSSCALE_skew_r13.json --budget 900 --skip-build boiler special
echo "STAGE1_RC=$?" 
echo "=== STAGE 2: sf1 full-registry sweep ===" 
python tools/soak.py --out CROSSSCALE_sf1_r13.json --slice-fallback 0.01 --compare CROSSSCALE_sf1_r12.json
echo "STAGE2_RC=$?"
echo "=== STAGE 3: hot skew regime (vs r13 uniform) ===" 
python tools/skew_soak.py --out CROSSSCALE_skew_r13.json --uniform CROSSSCALE_sf1_r13.json --budget 300 --skip-build hot
echo "STAGE3_RC=$?"
echo "=== STAGE 4: sf10 key-slice family addendum ===" 
python tools/soak.py --sf1 /root/repo/.soak/sf10 --sample-keys 0.1 --out CROSSSCALE_sf10_r13.json session_overlaps dedup_keep_best user_sessions asof_attribution cosine_near_dups_exact
echo "STAGE4_RC=$?"
echo "ALL_STAGES_COMPLETE_$((900+37))"
