#!/usr/bin/env python
"""Name-compat shim: the reference calls its DMR entry point
call_dmr_dss_nanomethphase.py (+ an R DSS script); this engine's DSS-style DMR
caller is scripts/hap/call_dmr.py (pure Python, no R). Same flags."""

import os
import runpy
import sys

sys.argv[0] = os.path.join(os.path.dirname(os.path.abspath(__file__)), "call_dmr.py")
runpy.run_path(sys.argv[0], run_name="__main__")
