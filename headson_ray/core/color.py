"""ANSI color-mode resolution with env-var handling.

Replicates the reference's precedence exactly
(/root/reference/src/serialization/color.rs:58-106, wired through
src/main.rs:370-402):

- explicit ``--color`` / ``--no-color`` always win (On / Off);
- Auto mode (the default):
    1. CLICOLOR_FORCE or FORCE_COLOR truthy  -> color ON (beats NO_COLOR)
    2. NO_COLOR present (any value) or TERM=dumb -> color OFF
    3. CLICOLOR set -> truthy(CLICOLOR) AND stdout-is-tty
    4. otherwise  -> stdout-is-tty
- "truthy" for CLICOLOR/CLICOLOR_FORCE/FORCE_COLOR means set to anything
  other than "0" or the empty string (color.rs:58-64 env_bool); NO_COLOR
  only needs to be present.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Mapping


def env_bool(env: Mapping[str, str], var: str) -> bool | None:
    """color.rs:58-64: None if unset; set -> not ("0" or empty)."""
    if var not in env:
        return None
    s = env[var]
    return not (s == "0" or s == "")


def auto_color_enabled(env: Mapping[str, str], is_tty: bool) -> bool:
    """color.rs:88-100 auto_color_enabled."""
    if env_bool(env, "CLICOLOR_FORCE") is True or (
        env_bool(env, "FORCE_COLOR") is True
    ):
        return True
    if "NO_COLOR" in env or env.get("TERM") == "dumb":
        return False
    clicolor = env_bool(env, "CLICOLOR")
    if clicolor is not None:
        return clicolor and is_tty
    return is_tty


def resolve_color_enabled(
    mode: bool | None,
    *,
    env: Mapping[str, str] | None = None,
    is_tty: bool | None = None,
) -> bool:
    """color.rs:102-106 resolve_color_enabled.

    mode: True = On (--color), False = Off (--no-color), None = Auto.
    """
    if mode is True:
        return True
    if mode is False:
        return False
    if env is None:
        env = os.environ
    if is_tty is None:
        try:
            is_tty = sys.stdout.isatty()
        except (AttributeError, ValueError):
            is_tty = False
    return auto_color_enabled(env, is_tty)
