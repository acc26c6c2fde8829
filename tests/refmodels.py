"""Import the reference torch models (read-only, /root/reference) for parity testing.

The reference package imports pysam at module scope; this environment has none, so a
stub module is injected. This helper is TEST-ONLY — the engine itself never imports
reference code.
"""

from __future__ import annotations

import sys
import types


def import_reference_models():
    if "pysam" not in sys.modules:
        stub = types.ModuleType("pysam")
        stub.utils = types.SimpleNamespace(SamtoolsError=Exception)
        sys.modules["pysam"] = stub
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import ccsmeth.models as ref_models  # noqa: E402

    return ref_models


def torch_h0(seed, num_layers, batch, hidden, n_draws=1):
    """Replay the reference's randn h0 draws (models.py:77-87): seed once, then
    capture n_draws consecutive h0 tensors (one per init_hidden call)."""
    import torch

    torch.manual_seed(seed)
    return [torch.randn(num_layers * 2, batch, hidden) for _ in range(n_draws)]
