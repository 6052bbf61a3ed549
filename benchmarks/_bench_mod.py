"""Load the repo-root bench.py as a module for the probe scripts.

bench.py is repo tooling (the driver's benchmark entry), not part of the
installed mogptk_tpu package, so the probes load it by file path instead
of requiring the repo root on sys.path."""
import importlib.util
import os
import sys

_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "bench.py")
_spec = importlib.util.spec_from_file_location("bench", _path)
bench = importlib.util.module_from_spec(_spec)
sys.modules.setdefault("bench", bench)
_spec.loader.exec_module(bench)
