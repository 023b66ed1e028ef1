"""Serialization-contract tests (the vanilla-driver hazard class).

Spark ships every Python kernel to executors via cloudpickle. A kernel
defined at module level pickles BY REFERENCE (``module.qualname``), so
the executor's Python worker must be able to import this package — true
in the configured local gate (repo on ``sys.path``), FALSE when the
engine is loaded from a file path by an external driver. A round-7
vanilla-session rehearsal caught exactly that failure
(``ModuleNotFoundError`` / ``PYTHON_DATA_SOURCE_ERROR``) for the
stateful update functions and the Python DataSource classes; the fix is
by-VALUE serialization everywhere (nested defs, udf factories,
``_ship_by_value`` clones, ``register_pickle_by_value`` for DataSource
modules — contract documented in ``streaming/stateful.py``).

These tests pin the contract end-to-end: dump each kernel with the same
cloudpickle Spark uses, then unpickle AND EXECUTE it in a subprocess
whose ``cwd``/``PYTHONPATH`` make the package unimportable (asserted
in-child before the roundtrip). No SparkSession needed.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pandas as pd
import pytest
from pyspark import cloudpickle

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Child preamble: prove the package is NOT importable, then unpickle.
_CHILD = """
import sys, json
try:
    import jubilant_garbanzo_spark  # noqa: F401
    print("PKG_IMPORTABLE")
    sys.exit(2)
except ImportError:
    pass
from pyspark import cloudpickle
with open(sys.argv[1], "rb") as fh:
    obj = cloudpickle.loads(fh.read())
mode = sys.argv[2]
if mode == "grouped":
    import pandas as pd
    out = obj(pd.Series(range(1, 21)), pd.Series(range(100, 120)))
    print(json.dumps(out))
elif mode == "iter":
    import pandas as pd
    [out] = list(obj(iter([pd.Series(["Ab1 c!", None, "xyz"])])))
    print(json.dumps(out.tolist()))
elif mode == "decode":
    print(json.dumps(obj(b"abcdefg")))
elif mode == "resize":
    print(json.dumps(list(obj(b"abcdefg", 4, 3))))
elif mode == "class":
    print(json.dumps(obj.__name__))
"""


def _run_clean(tmp_path, obj, mode: str) -> str:
    """Cloudpickle ``obj``, unpickle+run it in a package-less child."""
    payload = tmp_path / "kernel.pkl"
    payload.write_bytes(cloudpickle.dumps(obj))
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        p
        for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and os.path.abspath(p) != REPO
    )
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD, str(payload), mode],
        cwd=str(tmp_path),  # away from the repo: '' must not resolve it
        env=env,
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 0, (
        f"clean-subprocess roundtrip failed (mode={mode}):\n"
        f"stdout: {proc.stdout}\nstderr: {proc.stderr[-2000:]}"
    )
    assert "PKG_IMPORTABLE" not in proc.stdout, (
        "child could import the package — the test environment cannot "
        "prove by-value serialization; fix the PYTHONPATH scrub"
    )
    return proc.stdout.strip().splitlines()[-1]


def test_grouped_agg_factory_ships_by_value(tmp_path, spark):
    """The GROUPED_AGG udf from the factory runs without the package.

    (``spark``: the ``@pandas_udf`` decorator needs an active session
    at decoration time — same requirement the engine meets because the
    factories are called inside query bodies, never at import.)"""
    from jubilant_garbanzo_spark.functions.groupedagg import (
        make_trimmed_mean_chars,
    )

    fn = make_trimmed_mean_chars().func
    expected = fn(pd.Series(range(1, 21)), pd.Series(range(100, 120)))
    got = float(_run_clean(tmp_path, fn, "grouped"))
    assert got == expected  # bit-identical: same code object, same input


def test_scalar_iter_factory_ships_by_value(tmp_path, spark):
    """The SCALAR_ITER udf from the factory runs without the package."""
    from jubilant_garbanzo_spark.functions.scalariter import (
        make_alnum_count_iter,
    )

    import json

    fn = make_alnum_count_iter().func
    [expected] = list(fn(iter([pd.Series(["Ab1 c!", None, "xyz"])])))
    got = json.loads(_run_clean(tmp_path, fn, "iter"))
    assert got == expected.tolist() == [4, 0, 3]


def test_multimodal_kernels_ship_by_value(tmp_path):
    """``_ship_by_value`` clones run without the package importable."""
    from jubilant_garbanzo_spark.operators import multimodal as mm

    decode = mm._ship_by_value(mm._fake_decode)
    assert _run_clean(tmp_path, decode, "decode") == "[8, 8, 8]"
    assert decode(b"abcdefg") == mm._fake_decode(b"abcdefg")

    resize = mm._ship_by_value(mm._fake_resize)
    got = __import__("json").loads(_run_clean(tmp_path, resize, "resize"))
    assert bytes(got) == mm._fake_resize(b"abcdefg", 4, 3)


@pytest.mark.parametrize(
    "register_name, module_name, class_name",
    [
        (
            "register_tweet_source",
            "jubilant_garbanzo_spark.sources.tweet_source",
            "TweetFirehoseDataSource",
        ),
        (
            "register_jsonl_sink",
            "jubilant_garbanzo_spark.sources.jsonl_sink",
            "JsonlSinkDataSource",
        ),
    ],
)
def test_datasource_classes_ship_by_value(
    tmp_path, register_name, module_name, class_name
):
    """After ``register_*`` runs, the DataSource CLASS itself unpickles
    in a package-less child — the exact payload Spark sends per task.
    A stub session exercises the real registration path (the by-value
    marking happens there) without needing a SparkSession."""
    import importlib

    mod = importlib.import_module(module_name)

    class _StubDataSourceReg:
        def register(self, cls):
            self.registered = cls

    class _StubSpark:
        dataSource = _StubDataSourceReg()

    getattr(mod, register_name)(_StubSpark())
    cls = getattr(mod, class_name)
    assert _run_clean(tmp_path, cls, "class") == f'"{class_name}"'
