"""Run ONLY the TTFT section of bench.py on the attached chip (quick iterate)."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

out = bench.bench_ttft()
print(json.dumps(out))
