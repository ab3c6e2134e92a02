"""Native C++ batch assembler: correctness of gather + prefetch FIFO."""

import os
import tempfile

import numpy as np
import pytest

from moma_tpu.data.native import NativeBatcher, get_lib

pytestmark = pytest.mark.skipif(get_lib() is None, reason="no g++ available")


@pytest.fixture(scope="module")
def pack():
    n, shape = 64, (8, 8, 3)
    rs = np.random.RandomState(0)
    data = rs.randint(0, 256, (n, *shape), dtype=np.uint8)
    f = tempfile.NamedTemporaryFile(delete=False, suffix=".bin")
    f.write(data.tobytes())
    f.close()
    yield f.name, n, shape, data
    os.unlink(f.name)


def test_gather_matches_numpy(pack):
    path, n, shape, data = pack
    b = NativeBatcher(path, n, shape)
    idx = np.asarray([5, 0, 63, 17, 17, 2])
    out = b.gather(idx)
    np.testing.assert_array_equal(out, data[idx])
    b.close()


def test_gather_multithreaded(pack):
    path, n, shape, data = pack
    b = NativeBatcher(path, n, shape)
    idx = np.random.RandomState(1).randint(0, n, 256)
    out = b.gather(idx, threads=8)
    np.testing.assert_array_equal(out, data[idx])
    b.close()


def test_prefetch_fifo(pack):
    path, n, shape, data = pack
    b = NativeBatcher(path, n, shape)
    b.start(batch_size=16, depth=3, threads=4)
    batches = [np.random.RandomState(i).randint(0, n, 16) for i in range(5)]
    for idx in batches:
        b.submit(idx)
    for idx in batches:  # FIFO order must hold
        out = b.get()
        np.testing.assert_array_equal(out, data[idx])
    b.close()
