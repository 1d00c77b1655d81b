import os
import sys

import pytest

_HERE = os.path.dirname(os.path.abspath(__file__))
_ROOT = os.path.dirname(_HERE)
for p in (_ROOT, _HERE):
    if p not in sys.path:
        sys.path.insert(0, p)


@pytest.fixture(scope='session')
def ray_session():
    """One Ray session for the whole test run (driver guidance)."""
    import ray
    if not ray.is_initialized():
        ray.init(address='local', num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True)
    yield ray
    ray.shutdown()


@pytest.fixture(scope='session')
def shared_fonts():
    from engine.pdfcore.extract import SharedFontState
    return SharedFontState()
