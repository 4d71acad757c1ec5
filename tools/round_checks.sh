#!/bin/sh
# Round gate script: the checks that MUST run on the TPU-attached rig
# before a round closes (VERDICT r04 #9). CI's github-hosted lanes cover
# the CPU suite + ASan/UBSan; these two need the real device / the
# native parser under sanitizers and are wired here AND in the
# self-hosted tpu lane of .github/workflows/ci.yml.
set -e
cd "$(dirname "$0")/.."
echo "== FMA gate: device 9/7 byte-identity (hardware contract) =="
python tools/fma_hw_check.py
echo "== ASan/UBSan over the native layer (incl. the T2 parser on untrusted bytes) =="
sh tools/sanitize_check.sh 120
echo "== HT device coder hardware byte-identity =="
python tools/ht_device_hw_check.py
echo "ROUND CHECKS: PASS"
