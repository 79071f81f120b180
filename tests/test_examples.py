"""Smoke tests for the example apps (the reference treats samples/ as
manual integration tests; here the cheapest two run headless in CI so
API drift in the demos is caught — a KHT return-shape change once broke
hough_lines.py silently).

Only the lightest-compiling examples run; the heavy ones (MSER, VO,
object recognition) are exercised through their library paths elsewhere.
"""
import os
import runpy
import sys

import pytest

_EX = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))), "examples")


def _run(name, argv, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(sys, "argv", argv)
    runpy.run_path(os.path.join(_EX, name), run_name="__main__")


def test_features_detection(tmp_path, monkeypatch, capsys):
    _run("features_detection.py", ["x"], tmp_path, monkeypatch)
    assert (tmp_path / "corners.png").exists()
    out = capsys.readouterr().out
    n = int(out.split("corners")[0].split()[-1])
    assert n > 50          # synthetic checkerboard has hundreds of corners


def test_thresholding_morph(tmp_path, monkeypatch, capsys):
    _run("thresholding_morph.py", ["x"], tmp_path, monkeypatch)
    for f in ("thresh_otsu.png", "thresh_adaptive.png",
              "morph_open.png", "morph_close.png"):
        assert (tmp_path / f).exists()
    assert "otsu threshold=" in capsys.readouterr().out


def test_fit_shapes(tmp_path, monkeypatch, capsys):
    # asserts recovered slope/curvature internally
    _run("fit_shapes.py", ["x"], tmp_path, monkeypatch)
    assert (tmp_path / "fit_shapes.png").exists()


def test_hough_lines(tmp_path, monkeypatch, capsys):
    # the KHT return-shape drift broke exactly this script once
    _run("hough_lines.py", ["x"], tmp_path, monkeypatch)
    assert (tmp_path / "hough_sht.png").exists()
    assert (tmp_path / "hough_kht.png").exists()
    out = capsys.readouterr().out
    # the synthetic scene has 3 bars; NMS duplicates allowed, zero is not
    sht_n = int(out.split("sht:")[1].split()[0])
    assert sht_n >= 3
