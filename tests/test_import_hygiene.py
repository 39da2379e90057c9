"""Import hygiene: no dliom_tpu module may create device arrays at import.

Module-level `jnp.asarray(...)`-style constants dispatch an op to the
DEFAULT backend at import time — before any caller can pin a platform. In
the driver environment a version-skewed TPU plugin is registered via
sitecustomize, so such a leak initializes (and crashes on) the TPU client
even when the caller wants a virtual CPU mesh (root cause of the failed
MULTICHIP_r01/r02 artifacts; cf. the reference's in-process distributed
check, cloud/internal/client_server_test.cc, which must be equally
environment-independent).

The checks run in fresh subprocesses: the test process itself has backends
initialized by conftest.py.
"""

import pkgutil
import subprocess
import sys

import pytest

import dliom_tpu

_CHECK = """
import sys
mod = sys.argv[1]
__import__(mod)
from jax._src import xla_bridge
bk = list(xla_bridge._backends.keys())
if bk:
    print("backend(s) initialized by import of %s: %s" % (mod, bk))
    sys.exit(1)
"""


def _all_modules():
    return sorted(
        m.name for m in pkgutil.walk_packages(dliom_tpu.__path__, "dliom_tpu.")
    )


# One subprocess importing everything (fast path); the named-module cases
# below pin the historically leaky imports individually for diagnosis.
def test_no_backend_initialized_by_any_import():
    mods = _all_modules()
    code = _CHECK.replace("__import__(mod)", "\n".join(
        f"__import__({m!r})" for m in mods
    ))
    r = subprocess.run(
        [sys.executable, "-c", code, "all"], capture_output=True, text=True
    )
    assert r.returncode == 0, r.stdout + r.stderr


@pytest.mark.parametrize(
    "mod",
    [
        # The r02 leak chain: __graft_entry__ imported parallel.batch before
        # pinning a platform; these two held module-level jnp constants.
        "dliom_tpu.parallel.batch",
        "dliom_tpu.mapping.grid",
        "dliom_tpu.ops.pallas_apply",
        "dliom_tpu.frontend.lio",
        "dliom_tpu.backend.optimization",
    ],
)
def test_no_backend_initialized_by_import(mod):
    r = subprocess.run(
        [sys.executable, "-c", _CHECK, mod], capture_output=True, text=True
    )
    assert r.returncode == 0, r.stdout + r.stderr


def test_dryrun_multichip_with_tpu_plugin_like_default():
    """dryrun_multichip must succeed even when it is the first jax user in
    the process (driver scenario): platform pin must precede backend init."""
    code = """
import __graft_entry__
__graft_entry__.dryrun_multichip(4)
from jax._src import xla_bridge
bk = list(xla_bridge._backends.keys())
assert bk == ["cpu"], bk
print("ok")
"""
    r = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=900,
    )
    assert r.returncode == 0, r.stdout + r.stderr[-4000:]
    assert "ok" in r.stdout
