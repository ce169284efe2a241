"""Reference-config key compatibility: `ray_chunk` (reference
models/nerf.py:133), `checkpoint.save_top_k` (reference launch.py:72-75),
`export.chunk_size` chunked vertex evaluation (reference models/nerf.py:156),
`trainer.num_sanity_val_steps`."""

import os

import jax.numpy as jnp
import numpy as np

from instant_nsr_pl_tpu.config import config_from_dict, load_config
from instant_nsr_pl_tpu.models.isosurface import chunked_point_eval
from instant_nsr_pl_tpu.registry import systems
from instant_nsr_pl_tpu.trainer import Trainer
import instant_nsr_pl_tpu.systems  # noqa: F401
import instant_nsr_pl_tpu.models  # noqa: F401


def test_ray_chunk_aliases_eval_chunk():
    # the reference's own YAML spells the chunk `ray_chunk` only
    cfg = load_config(
        "/root/reference/configs/nerf-blender.yaml",
        cli_args=["dataset.scene=lego", "model.ray_chunk=2048"],
    )
    system = systems.make(cfg.system.name, cfg)
    assert system.eval_chunk_rays == 2048
    # explicit eval_chunk_rays wins over the alias
    cfg2 = load_config(
        "/root/reference/configs/nerf-blender.yaml",
        cli_args=[
            "dataset.scene=lego",
            "model.ray_chunk=2048",
            "model.eval_chunk_rays=512",
        ],
    )
    assert systems.make(cfg2.system.name, cfg2).eval_chunk_rays == 512


def test_chunked_point_eval_matches_direct():
    pts = np.random.RandomState(0).randn(103, 3).astype(np.float32)

    def fn(p):
        return {"a": p * 2.0, "b": jnp.sum(p, axis=-1)}

    out = chunked_point_eval(fn, pts, chunk=16)  # 103 = 6*16 + 7 (ragged tail)
    np.testing.assert_allclose(out["a"], pts * 2.0, rtol=1e-6)
    np.testing.assert_allclose(out["b"], pts.sum(-1), rtol=1e-6)
    # single-chunk shortcut
    out2 = chunked_point_eval(fn, pts, chunk=4096)
    np.testing.assert_allclose(np.asarray(out2["a"]), pts * 2.0, rtol=1e-6)


def _tiny_trainer(tmp_path, **ckpt):
    cfg = config_from_dict(
        {
            "trainer": {"max_steps": 10},
            "checkpoint": dict(ckpt),
            "model": {"name": "m"},
        }
    )
    return Trainer(cfg, str(tmp_path), loggers=[])


def test_save_top_k_prunes_old_checkpoints(tmp_path):
    tr = _tiny_trainer(tmp_path, save_top_k=2)
    state = {"step": jnp.int32(0), "w": jnp.ones((3,))}
    for s in (1, 2, 3, 4):
        tr.save(None, state, s)
    kept = sorted(os.listdir(tr.ckpt_dir))
    assert kept == ["step=3.ckpt.npz", "step=4.ckpt.npz"]


def test_save_top_k_zero_disables(tmp_path):
    tr = _tiny_trainer(tmp_path, save_top_k=0)
    assert tr.save(None, {"w": jnp.ones(2)}, 1) is None
    assert os.listdir(tr.ckpt_dir) == []


def test_save_top_k_default_keeps_all(tmp_path):
    tr = _tiny_trainer(tmp_path)
    state = {"w": jnp.ones(2)}
    for s in (1, 2, 3):
        tr.save(None, state, s)
    assert len(os.listdir(tr.ckpt_dir)) == 3


def test_export_vertex_color_chunked(tmp_path):
    """export.chunk_size bounds the vertex-attribute eval (reference
    models/nerf.py:156): a tiny chunk must give identical colors."""
    # NeuS + sphere_init: a surface is guaranteed at random init
    cfg = load_config(
        "configs/neus-synthetic.yaml",
        cli_args=[
            "export.export_vertex_color=true",
            "model.geometry.isosurface.resolution=20",
            "model.geometry.isosurface.chunk=8192",
            "model.geometry.xyz_encoding_config.n_levels=4",
            "model.geometry.xyz_encoding_config.log2_hashmap_size=12",
        ],
    )
    system = systems.make(cfg.system.name, cfg)
    state = system.init_state(seed=0)
    mesh_probe = system.model.export(
        state["params"], cfg.export, step=state["step"]
    )
    assert mesh_probe["v_pos"].shape[0] > 0
    cfg_big = config_from_dict({**dict(cfg.export), "chunk_size": 1 << 21})
    cfg.export["chunk_size"] = 37  # ragged, forces many padded chunks
    mesh_big = system.model.export(
        state["params"], cfg_big, step=state["step"]
    )
    mesh_chunked = system.model.export(
        state["params"], cfg.export, step=state["step"]
    )
    assert "v_rgb" in mesh_chunked
    np.testing.assert_allclose(
        np.asarray(mesh_chunked["v_rgb"]),
        np.asarray(mesh_big["v_rgb"]),
        atol=1e-5,
    )


def test_load_data_on_gpu_false_uint8_residency():
    """reference datasets/colmap.py:192,266-268 `load_data_on_gpu: false`:
    here = uint8-resident pixels (4x HBM cut, lossless vs the 8-bit source),
    dequantized in-kernel. Training and eval must work and match the f32
    path to 8-bit quantization."""
    import jax

    from instant_nsr_pl_tpu.registry import datasets
    import instant_nsr_pl_tpu.datasets  # noqa: F401

    over = [
        "dataset.size=32",
        "dataset.n_train=3",
        "dataset.n_val=1",
        "model.num_samples_per_ray=16",
        "model.train_num_rays=64",
        "model.max_train_num_rays=64",
        "model.train_num_samples=1024",
        "model.eval_chunk_rays=256",
        "model.eval_num_samples=4096",
        "model.geometry.xyz_encoding_config.n_levels=4",
        "model.geometry.xyz_encoding_config.log2_hashmap_size=12",
    ]
    cfg = load_config(
        "configs/nerf-synthetic.yaml",
        cli_args=over + ["dataset.load_data_on_gpu=false"],
    )
    dm = datasets.make(cfg.dataset.name, cfg.dataset)
    dm.setup("fit")
    sys_q = systems.make(cfg.system.name, cfg)
    sys_q.setup_data(dm.train)
    assert sys_q.data["images"].dtype == np.uint8
    assert sys_q.data["fg_masks"].dtype == np.uint8

    cfg_f = load_config("configs/nerf-synthetic.yaml", cli_args=over)
    dm_f = datasets.make(cfg_f.dataset.name, cfg_f.dataset)
    dm_f.setup("fit")
    sys_f = systems.make(cfg_f.system.name, cfg_f)
    sys_f.setup_data(dm_f.train)
    assert sys_f.data["images"].dtype == np.float32

    # same RNG -> same sampled pixels up to the 8-bit quantum
    rng = jax.random.PRNGKey(7)
    *_, rgb_q, m_q = sys_q._sample_rays(sys_q.data, rng)
    *_, rgb_f, m_f = sys_f._sample_rays(sys_f.data, rng)
    np.testing.assert_allclose(rgb_q, rgb_f, atol=0.5 / 255)
    np.testing.assert_allclose(m_q, m_f, atol=0.5 / 255)

    # a train step + eval run end-to-end on the quantized data
    state = sys_q.init_state(seed=0)
    state, metrics = sys_q.train_step(state)
    assert np.isfinite(float(metrics["train/loss"]))
    res = sys_q.evaluate_image(state, 0)
    assert np.isfinite(res["psnr"])
    assert res["gt"].dtype == np.float32


def test_predict_renders_train_trajectory(tmp_path):
    """--predict renders the dataset's predict split = the TRAIN split's
    views (reference datasets/blender.py:109-110, launch.py:119-121) and
    saves frames + a video, with no GT metrics."""
    from instant_nsr_pl_tpu.registry import datasets
    import instant_nsr_pl_tpu.datasets  # noqa: F401
    from tests.test_systems import _nerf_config

    cfg = _nerf_config(size=32).to_dict()
    cfg["dataset"].update({"size": 32, "n_train": 3, "n_val": 1})
    cfg["trainer"] = {"max_steps": 1, "log_every_n_steps": 1}
    cfg["model"]["eval_chunk_rays"] = 512
    cfg["model"]["eval_num_samples"] = 16384
    cfg = config_from_dict(cfg)
    dm = datasets.make(cfg.dataset.name, cfg.dataset)
    dm.setup("fit")
    system = systems.make(cfg.system.name, cfg)
    system.setup_data(dm.train)
    state = system.init_state(seed=0)
    tr = Trainer(cfg, str(tmp_path), loggers=[])
    n = tr.predict(system, dm, state)
    assert n == 3  # the train split's view count
    pred_dir = os.path.join(tr.save_dir, "it0-predict")
    assert sorted(os.listdir(pred_dir)) == ["0.png", "1.png", "2.png"]
    vids = [f for f in os.listdir(tr.save_dir) if f.startswith("it0-predict.")]
    assert vids, "predict video missing"
