import numpy as np
import pytest

from real3dportrait_tpu.data import IndexedDatasetBuilder
from real3dportrait_tpu.data.native_reader import NativePrefetchReader, native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="g++ toolchain unavailable"
)


def _make_store(path, n=20, compress=False):
    with IndexedDatasetBuilder(str(path), compress=compress) as b:
        for i in range(n):
            b.add_item({"i": i, "x": np.full((i + 1,), i, np.float32)})


def test_native_reader_in_order(tmp_path):
    path = tmp_path / "store"
    _make_store(path)
    reader = NativePrefetchReader(str(path))
    assert len(reader) == 20
    items = list(reader.iterate(n_threads=4))
    assert [it["i"] for it in items] == list(range(20))
    np.testing.assert_array_equal(items[7]["x"], np.full((8,), 7, np.float32))
    reader.close()


def test_native_reader_shuffled_order(tmp_path):
    path = tmp_path / "store"
    _make_store(path)
    order = np.random.RandomState(0).permutation(20)
    reader = NativePrefetchReader(str(path))
    items = list(reader.iterate(order=order, n_threads=3, ring_capacity=4))
    assert [it["i"] for it in items] == list(order)
    reader.close()


def test_native_reader_compressed(tmp_path):
    path = tmp_path / "storez"
    _make_store(path, compress=True)
    reader = NativePrefetchReader(str(path))
    items = list(reader.iterate(n_threads=2))
    assert [it["i"] for it in items] == list(range(20))
    reader.close()


def test_native_matches_python_reader(tmp_path):
    from real3dportrait_tpu.data import IndexedDataset

    path = tmp_path / "store"
    _make_store(path, n=50)
    py = IndexedDataset(str(path))
    nat = list(NativePrefetchReader(str(path)).iterate(n_threads=4))
    for i in range(50):
        np.testing.assert_array_equal(py[i]["x"], nat[i]["x"])
