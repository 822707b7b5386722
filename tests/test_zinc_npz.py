"""Real-ZINC export ingestion: round-trip the .npz schema byte-exactly.

The day a real export (tools/export_zinc.py, run on a networked host with
torch_geometric) lands at data/ZINC/zinc_<split>.npz, load_zinc_split
switches from the stand-in corpus to it — these tests prove that only the
data changes: save_zinc_npz -> _load_npz reproduces every Graph field
exactly and the downstream tokenizations are identical (reference loader:
zinc_dataset_indexbase.py:79)."""

import numpy as np
import pytest

from glearning_benchmark_tpu.data.zinc import (
    _load_npz,
    _synth_molecule,
    load_zinc_split,
    save_zinc_npz,
)
from glearning_benchmark_tpu.tokenization.ibtt import tokenize_zinc_molecule


@pytest.fixture(scope="module")
def molecules():
    return [_synth_molecule(9000 + i) for i in range(50)]


def test_npz_round_trip_exact(tmp_path, molecules):
    path = str(tmp_path / "zinc_val.npz")
    save_zinc_npz(path, molecules)
    back, flat = _load_npz(path)
    assert flat["n_nodes"].shape[0] == len(back)
    assert len(back) == len(molecules)
    for a, b in zip(molecules, back):
        assert a.num_nodes == b.num_nodes
        assert a.y == b.y
        np.testing.assert_array_equal(a.edges, b.edges)
        np.testing.assert_array_equal(a.node_labels, b.node_labels)
        np.testing.assert_array_equal(a.edge_labels, b.edge_labels)


def test_npz_tokenization_identical(tmp_path, molecules):
    """Tokenizing the ingested graphs must yield byte-identical texts to the
    direct-Graph path (IBTT order depends on the directed edge list shape)."""
    path = str(tmp_path / "zinc_val.npz")
    save_zinc_npz(path, molecules)
    back, flat = _load_npz(path)
    assert flat["n_nodes"].shape[0] == len(back)
    for a, b in zip(molecules, back):
        assert tokenize_zinc_molecule(a) == tokenize_zinc_molecule(b)


def test_load_zinc_split_prefers_export(tmp_path, molecules):
    """An export present at <root>/zinc_<split>.npz takes priority over the
    stand-in generator."""
    root = str(tmp_path)
    save_zinc_npz(f"{root}/zinc_test.npz", molecules)
    got = load_zinc_split(root, "test")
    assert len(got) == len(molecules)
    np.testing.assert_array_equal(got[0].edges, molecules[0].edges)
    # the other splits still fall back to the stand-in
    standin = load_zinc_split(root, "val", limit=5)
    assert len(standin) == 5


def test_export_schema_golden(tmp_path, molecules):
    """Freeze the export schema: key names, dtypes, offset invariants."""
    path = str(tmp_path / "zinc_train.npz")
    save_zinc_npz(path, molecules)
    z = np.load(path)
    assert sorted(z.files) == ["atom_types", "bond_types", "edge_dst",
                               "edge_offsets", "edge_src", "node_offsets", "y"]
    assert z["node_offsets"].dtype == np.int64
    assert z["edge_offsets"].dtype == np.int64
    assert z["atom_types"].dtype == np.int32
    assert z["y"].dtype == np.float64
    assert z["node_offsets"][0] == 0 and z["edge_offsets"][0] == 0
    assert z["node_offsets"][-1] == len(z["atom_types"])
    assert z["edge_offsets"][-1] == len(z["edge_src"]) == len(z["bond_types"])


def test_standin_target_is_nonlinear(molecules):
    """The stand-in regression target must not be solvable by a linear
    model over atom counts + size + ring count (VERDICT weak #6: the round-1
    target was quasi-linear and models bottomed out at MAE 0.02-0.2)."""
    mols = [_synth_molecule(5000 + i) for i in range(800)]
    feats = []
    ys = []
    for m in mols:
        counts = np.bincount(m.node_labels, minlength=9).astype(np.float64)
        n_und = len(m.edges) // 2
        rings = n_und - (m.num_nodes - 1)
        feats.append(np.concatenate([counts, [m.num_nodes, rings, 1.0]]))
        ys.append(m.y)
    X = np.asarray(feats)
    y = np.asarray(ys)
    coef, *_ = np.linalg.lstsq(X, y, rcond=None)
    resid_mae = np.abs(X @ coef - y).mean()
    assert resid_mae > 0.3, f"linear fit residual MAE {resid_mae:.3f} too low"
    assert y.std() > 0.5
