import os

# Reproducible figure bytes (ADVICE r3 #2): matplotlib stamps PDFs with
# /CreationDate and SVGs with dc:date + per-run hashed element ids, so
# no-op regenerations used to rewrite ~40 binary files into git history
# per boot. SOURCE_DATE_EPOCH pins both date stamps; svg.hashsalt pins
# the SVG id hashes. Set before pyplot state is touched by the
# submodules below; respects an externally provided epoch.
os.environ.setdefault("SOURCE_DATE_EPOCH", "315532800")  # 1980-01-01

import matplotlib  # noqa: E402

matplotlib.use("Agg")
matplotlib.rcParams["svg.hashsalt"] = "mpnn-tpu"

from . import loading, acc_eff, nld, routing  # noqa: E402

__all__ = ["loading", "acc_eff", "nld", "routing"]
