"""CLI process-level parity: exit codes, stderr error/notice formats,
path-mode skip behavior (reference src/main.rs:140-158, 313-367)."""

from __future__ import annotations

import subprocess
import sys


def run_cli(args, stdin=b"", cwd=None, env=None):
    import os

    full_env = None
    if env is not None:
        full_env = {
            k: v
            for k, v in os.environ.items()
            if k not in ("NO_COLOR", "CLICOLOR", "CLICOLOR_FORCE",
                         "FORCE_COLOR", "TERM")
        }
        full_env.update(env)
    p = subprocess.run(
        [sys.executable, "-m", "headson_ray.core.cli", *args],
        input=stdin,
        capture_output=True,
        cwd=cwd or "/root/repo",
        env=full_env,
    )
    return p.returncode, p.stdout.decode(), p.stderr.decode()


def test_valid_json_exit_zero():
    rc, out, err = run_cli(["-n", "100", "-f", "json"], b'{"a": 1}')
    assert rc == 0
    assert out == '{\n  "a": 1\n}\n'


def test_invalid_json_exit_one_stderr():
    rc, out, err = run_cli(["-n", "100", "-f", "json"], b"{invalid")
    assert rc == 1
    assert err.strip() != ""
    assert out == ""


def test_directory_skipped_with_notice(tmp_path):
    d = tmp_path / "subdir"
    d.mkdir()
    f = tmp_path / "a.json"
    f.write_text('{"x": 1}')
    rc, out, err = run_cli(
        ["-n", "200", "-f", "json", str(d), str(f)]
    )
    assert rc == 0
    assert f"Ignored directory: {d}" in err
    assert '"x": 1' in out


def test_binary_file_skipped_with_notice(tmp_path):
    b = tmp_path / "blob.bin"
    b.write_bytes(b"\x00\xff\xfebinary")
    f = tmp_path / "a.json"
    f.write_text("[1, 2]")
    rc, out, err = run_cli(["-n", "200", "-f", "json", str(b), str(f)])
    assert rc == 0
    assert f"Ignored binary file: {b}" in err
    assert "1" in out


def test_nul_after_1024_bytes_is_not_binary(tmp_path):
    # content_inspector semantics: only the first 1024 bytes are sniffed
    # (reference src/main.rs:313-346); a NUL later in the file must NOT
    # trigger the binary skip.
    f = tmp_path / "late-nul.txt"
    f.write_bytes(b"a" * 2000 + b"\x00" + b"b" * 10)
    rc, out, err = run_cli(["-n", "100", str(f)])
    assert rc == 0
    assert "Ignored binary file" not in err
    assert "aaa" in out


def test_utf16le_bom_file_is_text_not_skipped(tmp_path):
    # content_inspector parity (reference src/main.rs:313-346): a
    # BOM-prefixed UTF-16LE file is TEXT even though every other byte is
    # NUL — the reference summarizes it rather than skipping it.
    f = tmp_path / "u16.txt"
    f.write_bytes(b"\xff\xfe" + "hello utf16".encode("utf-16-le"))
    rc, out, err = run_cli(["-n", "200", str(f)])
    assert rc == 0
    assert "Ignored binary file" not in err
    assert out.strip() != ""


def test_utf8_and_utf32_boms_are_text(tmp_path):
    # .txt so text ingest handles the raw BOM bytes; the parity claim is
    # only about the binary SKIP decision (a BOM'd .json would fail the
    # JSON parse in the reference too — serde_json rejects BOMs)
    for name, payload in [
        ("u8.txt", b"\xef\xbb\xbf" + b'{"a": 1}'),
        ("u32le.txt", b"\xff\xfe\x00\x00" + "hi".encode("utf-32-le")),
        ("u32be.txt", b"\x00\x00\xfe\xff" + "hi".encode("utf-32-be")),
        ("u16be.txt", b"\xfe\xff" + "hi".encode("utf-16-be")),
    ]:
        f = tmp_path / name
        f.write_bytes(payload)
        rc, out, err = run_cli(["-n", "200", str(f)])
        assert rc == 0, name
        assert "Ignored binary file" not in err, name


def test_missing_file_is_error():
    rc, out, err = run_cli(["-n", "100", "/nonexistent/x.json"])
    assert rc == 1
    assert err.startswith("Error:")


def test_compact_single_line():
    rc, out, _ = run_cli(["-n", "500", "-f", "json", "-m"],
                         b'{"a": [1, 2], "b": {"c": 3}}')
    assert rc == 0
    assert out.rstrip("\n") == '{"a":[1,2],"b":{"c":3}}'
    assert "\n" not in out.rstrip("\n")


def test_no_newline_keeps_spaces():
    rc, out, _ = run_cli(["-n", "500", "-f", "json", "--no-newline"],
                         b'{"a": [1, 2]}')
    assert rc == 0
    body = out.rstrip("\n")
    assert "\n" not in body
    assert '"a": ' in body  # space after colon retained


def test_no_space_keeps_newlines():
    rc, out, _ = run_cli(["-n", "500", "-f", "json", "--no-space"],
                         b'{"a": 1}')
    assert rc == 0
    assert '"a":1' in out
    assert "\n" in out.rstrip("\n")


def test_custom_indent():
    rc, out, _ = run_cli(["-n", "500", "-f", "json", "--indent", "    "],
                         b'{"a": 1}')
    assert rc == 0
    assert '\n    "a": 1' in out
