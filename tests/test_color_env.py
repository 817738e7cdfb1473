"""T9 color parity: auto-mode + env-var resolution must match the
reference's precedence (src/serialization/color.rs:58-106):
CLICOLOR_FORCE/FORCE_COLOR > NO_COLOR/TERM=dumb > CLICOLOR&tty > tty.
Explicit --color/--no-color always win (ColorMode::On/Off)."""

from __future__ import annotations

import pytest

from headson_ray.core.color import (
    auto_color_enabled,
    env_bool,
    resolve_color_enabled,
)
from tests.test_cli_process import run_cli

ANSI = "\x1b["


# ---- unit grid: auto_color_enabled ----------------------------------------
@pytest.mark.parametrize(
    "env,is_tty,expected",
    [
        # plain tty detection
        ({}, True, True),
        ({}, False, False),
        # NO_COLOR present (any value, even empty) kills color
        ({"NO_COLOR": "1"}, True, False),
        ({"NO_COLOR": ""}, True, False),
        # TERM=dumb kills color; other TERMs do not
        ({"TERM": "dumb"}, True, False),
        ({"TERM": "xterm-256color"}, True, True),
        # CLICOLOR: truthy -> tty-gated; "0"/"" -> off even on tty
        ({"CLICOLOR": "1"}, True, True),
        ({"CLICOLOR": "1"}, False, False),
        ({"CLICOLOR": "0"}, True, False),
        ({"CLICOLOR": ""}, True, False),
        # CLICOLOR_FORCE / FORCE_COLOR trump everything, even NO_COLOR
        ({"CLICOLOR_FORCE": "1"}, False, True),
        ({"CLICOLOR_FORCE": "1", "NO_COLOR": "1"}, False, True),
        ({"FORCE_COLOR": "1", "TERM": "dumb"}, False, True),
        # but "0"/"" make the force vars non-forcing
        ({"CLICOLOR_FORCE": "0"}, False, False),
        ({"FORCE_COLOR": ""}, False, False),
        # NO_COLOR beats CLICOLOR=1
        ({"NO_COLOR": "x", "CLICOLOR": "1"}, True, False),
    ],
)
def test_auto_color_grid(env, is_tty, expected):
    assert auto_color_enabled(env, is_tty) is expected


def test_env_bool_semantics():
    assert env_bool({}, "X") is None
    assert env_bool({"X": "0"}, "X") is False
    assert env_bool({"X": ""}, "X") is False
    assert env_bool({"X": "1"}, "X") is True
    assert env_bool({"X": "anything"}, "X") is True


def test_explicit_modes_ignore_env():
    env = {"NO_COLOR": "1"}
    assert resolve_color_enabled(True, env=env, is_tty=False) is True
    env = {"CLICOLOR_FORCE": "1"}
    assert resolve_color_enabled(False, env=env, is_tty=True) is False


# ---- process-level: CLI through a pipe (stdout is NOT a tty) --------------
def _cli_color(envs, *flags):
    rc, out, err = run_cli(
        ["-n", "100", "-f", "json", "-t", "default", *flags],
        b'{"key": "value"}',
        env=envs,
    )
    assert rc == 0, err
    return ANSI in out


def test_cli_pipe_defaults_to_no_color():
    assert _cli_color({}) is False


def test_cli_force_color_env_beats_pipe():
    assert _cli_color({"CLICOLOR_FORCE": "1"}) is True
    assert _cli_color({"FORCE_COLOR": "1"}) is True


def test_cli_force_beats_no_color_env():
    assert _cli_color({"CLICOLOR_FORCE": "1", "NO_COLOR": "1"}) is True


def test_cli_no_color_env():
    assert _cli_color({"NO_COLOR": ""}) is False
    assert _cli_color({"TERM": "dumb", "CLICOLOR_FORCE": "0"}) is False


def test_cli_explicit_flags_beat_env():
    assert _cli_color({"NO_COLOR": "1"}, "--color") is True
    assert _cli_color({"CLICOLOR_FORCE": "1"}, "--no-color") is False


def test_cli_conflicting_flags_error():
    rc, out, err = run_cli(
        ["-n", "10", "--color", "--no-color"], b"{}"
    )
    assert rc == 2
    assert "--color" in err
