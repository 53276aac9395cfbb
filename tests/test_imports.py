"""Every module in the package imports cleanly (no broken deps/typos in the
less-exercised corners)."""

import importlib
import pkgutil

import audio_training_tpu


def test_all_modules_import():
    pkg = audio_training_tpu
    failures = []
    for m in pkgutil.walk_packages(pkg.__path__, prefix=pkg.__name__ + "."):
        try:
            importlib.import_module(m.name)
        except Exception as e:  # pragma: no cover
            failures.append((m.name, repr(e)))
    assert not failures, failures
