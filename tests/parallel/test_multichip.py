"""Multi-device convergence evidence on the conftest 8-virtual-device CPU
mesh: both the scenario-batch axis and the time/stage axis must solve to
tolerance, not just run a finite step."""

import importlib.util
import pathlib


def test_dryrun_multichip_converges():
    root = pathlib.Path(__file__).resolve().parents[2]
    spec = importlib.util.spec_from_file_location(
        "graft_entry", root / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(4)
