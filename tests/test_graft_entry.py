# Driver-contract tests for __graft_entry__.py.
#
# The round-1 driver capture failed (MULTICHIP_r01.json ok=false) because the
# entry was not hermetic: with JAX_PLATFORMS pinned to the session's TPU
# plugin, ops dispatched to the real chip and died on a libtpu mismatch.
# These tests run dryrun_multichip exactly the way the driver does — importing
# the module and calling the function from a parent process whose environment
# we deliberately poison — and assert the subprocess re-exec keeps it green.
import pytest
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_driver_style(extra_env):
    env = dict(os.environ)
    env.update(extra_env)
    # Tests smoke the tiny fast path; the driver's real call runs the full
    # true-size pipeline dryrun (~10-20 min on one CPU core).
    env["SVT_DRYRUN_FAST"] = "1"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    code = "import __graft_entry__ as g; g.dryrun_multichip(4)"
    return subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=1200)


@pytest.mark.slow
def test_dryrun_multichip_inprocess():
    sys.path.insert(0, REPO)
    os.environ["SVT_DRYRUN_FAST"] = "1"
    try:
        import __graft_entry__ as g
        g.dryrun_multichip(4)
    finally:
        sys.path.remove(REPO)
        os.environ.pop("SVT_DRYRUN_FAST", None)


@pytest.mark.slow
def test_dryrun_multichip_hermetic_vs_poisoned_env():
    # A parent env that pins a nonexistent platform and hostile XLA flags must
    # not leak into the dryrun: the re-exec strips and overrides them.
    proc = _run_driver_style({
        "JAX_PLATFORMS": "nonexistent_tpu_plugin",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
        "TPU_CHIPS_PER_HOST_BOUNDS": "poison",
    })
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "[dryrun_multichip] OK" in proc.stdout
