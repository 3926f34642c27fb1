"""Packaging metadata stays consistent with the code.

The reference ships no packaging at all (SURVEY.md §1 — bare scripts run
from the repo root); a standalone framework must be pip-installable, so
pyproject.toml carries the distribution metadata and the four console
entry points. This guards against entry points drifting away from the
CLI modules and against the package list silently losing a subpackage.
"""
import pathlib
import tomllib

from setuptools import find_packages

REPO = pathlib.Path(__file__).resolve().parents[1]


def _project():
    with open(REPO / "pyproject.toml", "rb") as f:
        return tomllib.load(f)["project"]


def test_entry_points_resolve():
    import importlib

    scripts = _project()["scripts"]
    assert set(scripts) == {"gator-train", "gator-test", "gator-demo",
                            "gator-serve"}
    for ep in scripts.values():
        mod, fn = ep.split(":")
        assert callable(getattr(importlib.import_module(mod), fn)), ep


def test_package_discovery_covers_all_subpackages():
    found = set(find_packages(where=str(REPO), include=["gator_tpu*"]))
    on_disk = {
        str(p.parent.relative_to(REPO)).replace("/", ".")
        for p in (REPO / "gator_tpu").rglob("__init__.py")
    }
    assert on_disk <= found, on_disk - found
    assert "tests" not in found


def test_runtime_dependencies_match_imports():
    """Every hard dependency in pyproject is really imported and vice
    versa (optional extras — torch/matplotlib/etc. — are lazy imports)."""
    deps = {d.split(">=")[0].split("==")[0].strip()
            for d in _project()["dependencies"]}
    assert deps == {"jax", "flax", "optax", "orbax-checkpoint", "numpy",
                    "scipy", "pyyaml"}
