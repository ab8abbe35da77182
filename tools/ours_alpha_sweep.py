"""Ours-side chess LP alpha sweep in ONE process (jit cache shared:
class weights are a traced argument, so 21 alphas compile once).

Skips legs whose artifact already exists (the CPU insurance run
produced the full parity-perfect sweep; re-running on TPU would only
refresh wall_s while burning scarce tunnel-up time). Force a re-run by
deleting the artifacts."""
import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")
from tools.protocol_chess import LP_EPOCHS, OUT_DIR, run_ours_lp

ALPHAS = [round(0.75 + 0.01 * i, 2) for i in range(21)]
for a in ALPHAS:
    w = round(a * 100)
    name = "ours_tmgcn1_lp.json" if w == 90 else f"ours_tmgcn1_lp_a{w}.json"
    if (OUT_DIR / name).exists():
        print(f"skip alpha={a} ({name} exists)")
        continue
    run_ours_lp("tmgcn1", LP_EPOCHS, alpha=a)
print("sweep done")
