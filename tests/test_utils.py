"""utils: debug/sanitizers, fault injection, profiling, visualization."""

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from clip_for_dl_tpu.utils import (
    FaultInjector,
    FencedTimer,
    StepTimer,
    assert_finite,
    count_params,
    deterministic_run,
    fence,
    throughput,
    validate_batch,
)
from clip_for_dl_tpu.utils import visualization as viz


class TestDebug:
    def test_assert_finite_ok(self):
        assert_finite({"a": jnp.ones(3)}, "x")

    def test_assert_finite_names_leaf(self):
        with pytest.raises(FloatingPointError, match="m/w"):
            assert_finite({"m": {"w": jnp.asarray([1.0, np.nan])}}, "p")

    def test_validate_batch(self):
        validate_batch(
            {"images": np.zeros((4, 8, 8, 3), np.uint8),
             "labels": np.ones((4, 16), np.float32),
             "mask": np.ones(4)},
            batch_size=4,
        )
        with pytest.raises(ValueError, match="binary"):
            validate_batch({"labels": np.full((2, 16), 0.5)})
        with pytest.raises(ValueError, match="label dim"):
            validate_batch({"labels": np.ones((2, 3))})

    def test_fault_injector_drop_and_corrupt(self):
        batches = [{"images": np.ones((2, 4, 4, 3), np.float32)} for _ in range(4)]
        fi = FaultInjector(batches, fault_batches=[1], mode="drop")
        assert len(list(fi)) == 3
        assert fi.faults_injected == 1
        fi = FaultInjector(batches, fault_batches=[0], mode="nan")
        out = list(fi)
        assert len(out) == 4
        assert np.isnan(out[0]["images"]).any()
        assert not np.isnan(batches[0]["images"]).any()  # original untouched

    def test_deterministic_run(self):
        with deterministic_run(3) as key:
            a = jax.random.normal(key, (4,))
        with deterministic_run(3) as key:
            b = jax.random.normal(key, (4,))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_count_params(self):
        assert count_params({"a": jnp.ones((2, 3)), "b": jnp.ones(5)}) == 11


class TestProfiling:
    def test_fenced_timer(self):
        with FencedTimer() as t:
            x = jnp.ones((64, 64)) @ jnp.ones((64, 64))
            t.set_result(x)
        assert t.seconds is not None and t.seconds > 0

    def test_fence_returns_tree(self):
        tree = {"x": jnp.ones(3)}
        assert fence(tree) is tree

    def test_step_timer_and_throughput(self):
        st = StepTimer()
        st.tick()
        st.tick()
        assert st.mean_step_seconds >= 0
        assert throughput(100, 2.0) == 50.0


class TestVisualization:
    def test_all_plots_write_files(self, tmp_path, rng):
        img = rng.random((16, 16))
        p = viz.display_image(img, "t", str(tmp_path / "a.png"))
        assert (tmp_path / "a.png").exists()

        hist = pd.DataFrame({
            "epoch": [0, 1], "train_loss": [1.0, 0.5], "val_loss": [1.1, 0.6],
            "lr/default": [1e-3, 9e-4],
        })
        viz.plot_training_history(hist, str(tmp_path / "h.png"))
        assert (tmp_path / "h.png").exists()

        viz.plot_confusion_matrix(
            rng.integers(0, 10, (4, 4)), list("abcd"), str(tmp_path / "c.png")
        )
        viz.visualize_top_predictions(
            img, ["a", "b"], [0.9, 0.3], str(tmp_path / "t.png")
        )
        viz.visualize_disease_distribution(
            {"a": 5, "b": 2}, str(tmp_path / "d.png")
        )
        viz.plot_metrics_comparison(
            {"run1": {"f1": 0.5}, "run2": {"f1": 0.6}}, ["f1"],
            str(tmp_path / "m.png"),
        )
        viz.visualize_image_text_similarity(
            rng.random(5), [f"text {i}" for i in range(5)], 3,
            str(tmp_path / "s.png"),
        )
        viz.visualize_predictions(
            rng.random((2, 8, 8)), [["a"], ["b"]], [["a"], ["c"]],
            str(tmp_path / "p.png"),
        )
        for f in ("c.png", "t.png", "d.png", "m.png", "s.png", "p.png"):
            assert (tmp_path / f).exists()

    def test_csv_outputs(self, tmp_path, rng):
        hist = pd.DataFrame({"epoch": [0], "train_loss": [1.0]})
        viz.save_history_csv(hist, str(tmp_path / "hist.csv"))
        viz.save_predictions_csv(
            rng.random((3, 2)), rng.integers(0, 2, (3, 2)),
            ["a", "b"], str(tmp_path / "pred.csv"),
            paths_col=["x.png", "y.png", "z.png"],
        )
        df = pd.read_csv(tmp_path / "pred.csv")
        assert {"image", "prob/a", "true/b"} <= set(df.columns)


def test_save_top_correct_csv(tmp_path, rng):
    probs = np.array([[0.9, 0.1], [0.2, 0.8]])
    labels = np.array([[1, 0], [1, 0]])
    path = viz.save_top_correct_csv(
        probs, labels, ["a", "b"], str(tmp_path / "tc.csv"),
        paths_col=["x.png", "y.png"],
    )
    df = pd.read_csv(path)
    assert len(df) == 1 and df.iloc[0]["top1"] == "a"
