import sys, time
sys.path.insert(0, '/root/repo/tools'); sys.path.insert(0, '/tmp')
import importlib.util
spec = importlib.util.spec_from_file_location("cot", "/root/repo/tools/compare_oracle_timeout.py")
cot = importlib.util.module_from_spec(spec); spec.loader.exec_module(cot)
from sf1_oracles import REFORMULATED

sf_dir, out_dir = sys.argv[1], sys.argv[2]
only = sys.argv[3].split(",") if len(sys.argv) > 3 else list(REFORMULATED)
for q in only:
    t0 = time.time()
    print(q, cot.check_one((sf_dir, out_dir, q, REFORMULATED[q])), f"{time.time()-t0:.0f}s", flush=True)
