"""CLI subcommands and observability primitives (SURVEY.md §2b #27/#28)."""

import json
import logging

import numpy as np
import pytest

from tpurt.cli.main import build_parser, cmd_build_bvh, cmd_render
from tpurt.obs import Meter, compiled_cost, emit, get_logger, trace_span


def test_parser_covers_all_subcommands():
    p = build_parser()
    for cmd in ("render", "build-bvh", "fit", "check-grads", "bench"):
        args = p.parse_args([cmd] if cmd != "render" else ["render", "-o", "x.png"])
        assert callable(args.fn)


def test_cli_render_writes_image(tmp_path):
    out = tmp_path / "img.npy"
    args = build_parser().parse_args(
        ["render", "--scene", "cornell", "--width", "8", "-o", str(out)]
    )
    assert cmd_render(args) == 0
    img = np.load(out)
    assert img.shape == (8, 8, 3) and np.isfinite(img).all() and img.max() > 0


def test_cli_build_bvh(capsys):
    args = build_parser().parse_args(["build-bvh", "--scene", "cornell"])
    assert cmd_build_bvh(args) == 0
    row = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert row["metric"] == "bvh_build" and row["value"] > 0


def test_meter_rates():
    m = Meter("rays")
    m.tick(100, 0.5)
    m.tick(100, 0.5)
    assert m.rate == pytest.approx(200.0)
    m.start()
    r = m.stop(50)
    assert r > 0 and m.count == 250


def test_emit_json_line(capsys):
    emit("x", 1.5, "u", vs_baseline=0.1)
    row = json.loads(capsys.readouterr().out)
    assert row == {"metric": "x", "value": 1.5, "unit": "u", "vs_baseline": 0.1}


def test_trace_span_and_cost():
    import jax.numpy as jnp

    with trace_span("unit_span"):
        pass
    cost = compiled_cost(lambda x: (x @ x).sum(), jnp.ones((64, 64)))
    assert isinstance(cost, dict)


def test_get_logger_prefix(capsys):
    log = get_logger("tpurt.test", level=logging.INFO)
    log.info("hello")
    assert "[p0/1]" in capsys.readouterr().err
