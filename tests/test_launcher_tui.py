"""Launcher curses TUI (krasis_tpu/launcher_tui.py).

State helpers are tested directly; the full 4-screen flow is driven
once through a real pseudo-terminal (curses needs a TTY) with scripted
keystrokes: select model → hardware → cycle a setting → save+quit. The
saved config must reflect the edit.
"""

import json
import os
import pty
import select
import subprocess
import sys
import time

import pytest

from krasis_tpu.launcher_tui import CHOICES, SettingState, budget_lines


def test_setting_state_cycle_and_edit():
    s = SettingState({"expert_bits": "8", "port": "9000"})
    assert s.values["expert_bits"] == "8"
    assert s.values["port"] == "9000"
    # cycling an enumerated setting wraps through its choices
    assert s.cycle(0, 1)
    assert s.values["expert_bits"] == "4"
    assert s.cycle(0, 1)
    assert s.values["expert_bits"] == "8"
    # free-text settings don't cycle
    idx_port = [i for i, (k, *_ ) in enumerate(
        __import__("krasis_tpu.launcher", fromlist=["SETTINGS"]).SETTINGS)
        if k == "port"][0]
    assert not s.cycle(idx_port, 1)
    s.set(idx_port, "8401")
    assert s.values["port"] == "8401"
    # every CHOICES key is a real setting
    keys = {k for k, *_ in
            __import__("krasis_tpu.launcher", fromlist=["SETTINGS"]).SETTINGS}
    assert set(CHOICES) <= keys


def test_budget_lines_never_raise(tmp_path):
    # nonexistent model → graceful panel message, not an exception
    lines = budget_lines(str(tmp_path / "nope"), {"expert_bits": "4"})
    assert lines and "unavailable" in lines[0]


@pytest.mark.skipif(not sys.stdout.isatty() and os.environ.get("CI"),
                    reason="pty flow needs a host that allows ptys")
def test_tui_flow_through_pty(tmp_path):
    """Drive the real curses UI in a pty: enter (select model) → enter
    (hardware) → right-arrow (cycle expert_bits 4→8) → s (save+quit)."""
    home = tmp_path / "home"
    home.mkdir()
    model_dir = tmp_path / "models" / "tiny"
    model_dir.mkdir(parents=True)
    (model_dir / "config.json").write_text(json.dumps({
        "model_type": "qwen3_moe", "hidden_size": 64,
        "intermediate_size": 128, "moe_intermediate_size": 32,
        "num_hidden_layers": 2, "num_attention_heads": 4,
        "num_key_value_heads": 2, "head_dim": 16, "vocab_size": 256,
        "num_experts": 8, "num_experts_per_tok": 2,
        "max_position_embeddings": 4096,
    }))
    (model_dir / "model.safetensors").write_bytes(b"\x08\0\0\0\0\0\0\0{}")

    master, slave = pty.openpty()
    env = dict(os.environ, KRASIS_TPU_HOME=str(home), TERM="xterm",
               JAX_PLATFORMS="cpu")
    env.pop("AXON_LOOPBACK_RELAY", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    proc = subprocess.Popen(
        [sys.executable, "-m", "krasis_tpu.launcher",
         "--models-dir", str(tmp_path / "models")],
        stdin=slave, stdout=slave, stderr=subprocess.DEVNULL,
        env=env, cwd="/root/repo")
    os.close(slave)

    # Marker-driven, not sleep-driven: fixed sleeps desync whenever the
    # host is loaded (jax import alone can exceed any guess), sending
    # keys before the screen that consumes them exists.
    def wait_for(marker: bytes, timeout: float = 120.0) -> bytes:
        buf = b""
        deadline = time.time() + timeout
        while time.time() < deadline:
            r, _, _ = select.select([master], [], [], 0.5)
            if r:
                try:
                    buf += os.read(master, 4096)
                except OSError:
                    break
            if marker in buf:
                return buf
            if proc.poll() is not None:
                break
        raise AssertionError(
            f"marker {marker!r} not seen; exit={proc.poll()} "
            f"tail={buf[-400:]!r}")

    def send(b: bytes):
        time.sleep(0.3)            # let curses finish the repaint
        os.write(master, b)

    try:
        wait_for(b"select model")          # screen 1 painted
        send(b"\r")
        wait_for(b"hardware")              # screen 2
        send(b"\r")
        wait_for(b"configure")             # screen 3 (settings editor)
        send(b"]")                         # cycle expert_bits 4→8
        send(b"s")                         # save + quit
        deadline = time.time() + 120
        while proc.poll() is None and time.time() < deadline:
            r, _, _ = select.select([master], [], [], 0.5)
            if r:
                try:
                    os.read(master, 4096)   # drain so the TUI can write
                except OSError:
                    break
        assert proc.poll() == 0, f"launcher exit {proc.poll()}"
    finally:
        if proc.poll() is None:
            proc.kill()
        os.close(master)

    cfg_path = home / "config"
    assert cfg_path.exists()
    cfg = dict(line.split("=", 1) for line in
               cfg_path.read_text().splitlines() if "=" in line)
    assert cfg["expert_bits"] == "8"          # the ←/→ edit landed
    assert cfg["model"].endswith("tiny")
