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


def test_prefetch_get_view_zero_copy(pack):
    """get_view returns correct rows in FIFO order; released buffers are
    recycled (pool) without corrupting batches still held."""
    path, n, shape, data = pack
    b = NativeBatcher(path, n, shape)
    b.start(batch_size=16, depth=3, threads=4)
    batches = [np.random.RandomState(10 + i).randint(0, n, 16)
               for i in range(8)]
    for idx in batches[:3]:
        b.submit(idx)
    # hold two views at once: recycling one must not clobber the other
    v0, t0 = b.get_view()
    v1, t1 = b.get_view()
    np.testing.assert_array_equal(v0, data[batches[0]])
    np.testing.assert_array_equal(v1, data[batches[1]])
    b.release(t0)
    for idx in batches[3:]:
        b.submit(idx)
    np.testing.assert_array_equal(v1, data[batches[1]])  # still intact
    b.release(t1)
    for idx in batches[2:]:
        v, t = b.get_view()
        np.testing.assert_array_equal(v, data[idx])
        v_copy = np.array(v)
        b.release(t)
        np.testing.assert_array_equal(v_copy, data[idx])
    b.close()


def test_prefetch_get_after_view_mixes(pack):
    """Copy get() and zero-copy get_view() can interleave on one stream."""
    path, n, shape, data = pack
    b = NativeBatcher(path, n, shape)
    b.start(batch_size=16, depth=2, threads=2)
    batches = [np.random.RandomState(30 + i).randint(0, n, 16)
               for i in range(4)]
    for idx in batches:
        b.submit(idx)
    np.testing.assert_array_equal(b.get(), data[batches[0]])
    v, t = b.get_view()
    np.testing.assert_array_equal(v, data[batches[1]])
    b.release(t)
    np.testing.assert_array_equal(b.get(), data[batches[2]])
    v, t = b.get_view()
    np.testing.assert_array_equal(v, data[batches[3]])
    b.release(t)
    b.close()
