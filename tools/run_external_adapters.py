"""Evidence harness for the external GBDT adapters (SynapseML LightGBM /
xgboost.spark).

This container ships neither library, so the end-to-end adapter tests in
tests/test_models_external.py skip cleanly here and the adapters have never
executed against the real backends. Run THIS script in the first environment
that has them — it detects what is importable, runs the full adapter test
module (end-to-end fits included, no skips for present libs), and records
the outcome in EXTERNAL_ADAPTERS_RESULT.json so the evidence is a committed
artifact rather than a claim.

Usage: python tools/run_external_adapters.py
Exit code: pytest's (0 = everything runnable passed).
"""

from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _importable(mod: str) -> bool:
    try:
        return importlib.util.find_spec(mod) is not None
    except (ImportError, ModuleNotFoundError, ValueError):
        return False


def main() -> int:
    libs = {
        "synapse.ml.lightgbm": _importable("synapse.ml.lightgbm"),
        "lightgbm": _importable("lightgbm"),
        "xgboost.spark": _importable("xgboost.spark"),
    }
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/test_models_external.py",
         "-v", "-rs", "--tb=short"],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    tail = "\n".join(proc.stdout.strip().splitlines()[-25:])
    result = {
        "timestamp_utc": datetime.now(timezone.utc).isoformat(),
        "libraries_importable": libs,
        "end_to_end_possible": {
            "lightgbm": libs["synapse.ml.lightgbm"] and libs["lightgbm"],
            "xgboost": libs["xgboost.spark"],
        },
        "pytest_exit_code": proc.returncode,
        "pytest_tail": tail,
    }
    out_path = os.path.join(REPO, "EXTERNAL_ADAPTERS_RESULT.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: result[k] for k in
                      ("libraries_importable", "end_to_end_possible",
                       "pytest_exit_code")}))
    print(f"wrote {out_path}", file=sys.stderr)
    return proc.returncode


if __name__ == "__main__":
    raise SystemExit(main())
