#!/bin/sh
# Keep benches/run_staging_experiments.py alive across relay-outage
# budget exhaustions: the runner exits rc=3 when the relay never
# answers within EXP_BUDGET; anything else (0 = experiments ran,
# other = real failure) ends the loop. Each attempt gets a fresh
# bounded budget so a multi-day outage is survived in 4 h slices
# without any unbounded single wait.
cd "$(dirname "$0")/.." || exit 1
while :; do
    EXP_BUDGET="${EXP_BUDGET:-14400}" python -u benches/run_staging_experiments.py
    rc=$?
    [ "$rc" -ne 3 ] && exit "$rc"
    echo "[supervisor] runner budget exhausted (rc=3); restarting" \
        >> benches/staging_experiments.log
    sleep 30
done
