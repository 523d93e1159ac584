"""Parity harness (SURVEY.md section 4.5): fixed inputs + fixed init must
reproduce the stored golden embeddings element-wise and the retrieval ranks
exactly. Regenerate with ``python tests/make_goldens.py`` ONLY when a
numerics change is intentional, and say so in the commit message."""

import os

import numpy as np
import pytest

from tests.make_goldens import GOLDEN_PATH, compute


@pytest.fixture(scope="module")
def goldens():
    if not os.path.exists(GOLDEN_PATH):
        pytest.skip("goldens not generated; run tests/make_goldens.py")
    return dict(np.load(GOLDEN_PATH))


@pytest.fixture(scope="module")
def current():
    return compute()


@pytest.mark.parametrize("name", ["flat", "hier", "full"])
def test_embeddings_match_goldens(goldens, current, name):
    np.testing.assert_allclose(
        current[f"{name}_video_emb"], goldens[f"{name}_video_emb"],
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        current[f"{name}_para_emb"], goldens[f"{name}_para_emb"],
        rtol=1e-5, atol=1e-6,
    )


@pytest.mark.parametrize("name", ["flat", "hier", "full"])
def test_ranks_match_goldens_exactly(goldens, current, name):
    np.testing.assert_array_equal(
        current[f"{name}_ranks_v2p"], goldens[f"{name}_ranks_v2p"]
    )
    np.testing.assert_array_equal(
        current[f"{name}_ranks_p2v"], goldens[f"{name}_ranks_p2v"]
    )


def test_train_loss_curve_matches_golden(goldens):
    """Config-1 integration slice: 8-step loss curve pinned (SURVEY 4.3).
    Guards the objective, optimizer wiring, and grad-clip numerics."""
    if "train_curve" not in goldens:
        pytest.skip("train_curve golden not generated")
    from tests.make_goldens import compute_train_curve

    got = compute_train_curve()
    np.testing.assert_allclose(got, goldens["train_curve"], rtol=1e-4,
                               atol=1e-6)
