import os, sys, time, importlib.util

TOOLS_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, TOOLS_DIR)
spec = importlib.util.spec_from_file_location(
    "cot", os.path.join(TOOLS_DIR, "compare_oracle_timeout.py"))
cot = importlib.util.module_from_spec(spec); spec.loader.exec_module(cot)
from sf1_oracles import REFORMULATED

sf_dir, out_dir = sys.argv[1], sys.argv[2]
only = sys.argv[3].split(",") if len(sys.argv) > 3 else list(REFORMULATED)
for q in only:
    t0 = time.time()
    print(q, cot.check_one((sf_dir, out_dir, q, REFORMULATED[q])), f"{time.time()-t0:.0f}s", flush=True)
