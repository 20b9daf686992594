"""Driver entry-point contract tests (``__graft_entry__.py``).

The round-3 MULTICHIP artifact died rc=124 because ``dryrun_multichip``
initialized the driver's default (axon TPU) backend before deciding to
re-exec onto its virtual CPU mesh — with the relay down, that first
``jax.devices()`` blocks unboundedly. The dryrun's contract is a virtual
CPU mesh; it must NEVER touch the default backend (VERDICT r3 #1).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __graft_entry__ as graft  # noqa: E402


def test_dryrun_reexecs_without_touching_default_backend(monkeypatch):
    """Unless already re-exec'd, the dryrun must go straight to the CPU
    re-exec — no ``jax.devices()`` (it would block forever on a dead
    relay) and no backend init of any kind."""
    import jax

    calls = []
    monkeypatch.delenv("_AM_DRYRUN_REEXEC", raising=False)
    monkeypatch.setattr(graft, "_reexec_dryrun", lambda n: calls.append(n))

    def poisoned_devices(*a, **k):  # pragma: no cover - failure path
        raise AssertionError(
            "dryrun_multichip touched jax.devices() before the CPU "
            "re-exec — this blocks unboundedly when the relay is down"
        )

    monkeypatch.setattr(jax, "devices", poisoned_devices)
    graft.dryrun_multichip(8)
    assert calls == [8]


def test_reexec_env_is_relay_proof(monkeypatch):
    """The re-exec child must get a blank PALLAS_AXON_POOL_IPS (the
    sitecustomize force-selects the axon backend otherwise), CPU
    platform, and a >=n device-count flag that REPLACES a smaller one."""
    captured = {}

    def fake_run(cmd, cwd=None, env=None):
        captured["env"] = env

        class R:
            returncode = 0

        return R()

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "10.255.255.1")
    monkeypatch.setenv(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=2"
    )
    graft._reexec_dryrun(8)
    env = captured["env"]
    assert env["PALLAS_AXON_POOL_IPS"] == ""
    assert env["JAX_PLATFORMS"] == "cpu"
    assert env["_AM_DRYRUN_REEXEC"] == "1"
    assert "--xla_force_host_platform_device_count=8" in env["XLA_FLAGS"]
    assert "device_count=2" not in env["XLA_FLAGS"]


@pytest.mark.slow
@pytest.mark.parametrize("n_devices", [8, 16])
def test_dryrun_completes_with_relay_unreachable(n_devices):
    """End-to-end: with the axon pool pointed at a blackhole address (a
    dead relay), the dryrun must still complete — the re-exec path never
    touches the poisoned backend. 16 is the v5e-16 target width (BASELINE
    config #5): proves the (data × seq) factorization and the
    pad/divisibility logic at the production mesh shape."""
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = "10.255.255.1"
    env.pop("_AM_DRYRUN_REEXEC", None)
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run(
        [
            sys.executable,
            "-c",
            f"import __graft_entry__ as g; g.dryrun_multichip({n_devices})",
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "dryrun_multichip OK" in r.stdout
