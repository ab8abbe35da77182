"""Ours-side chess LP alpha sweep in ONE process (jit cache shared:
class weights are a traced argument, so 21 alphas compile once)."""
import sys
sys.path.insert(0, "/root/repo")
from tools.protocol_chess import run_ours_lp, LP_EPOCHS

ALPHAS = [round(0.75 + 0.01 * i, 2) for i in range(21)]
for a in ALPHAS:
    run_ours_lp("tmgcn1", LP_EPOCHS, alpha=a)
print("sweep done")
