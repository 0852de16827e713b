"""Unified configuration tree (dataclasses).

Replaces the reference's three overlapping systems (SURVEY.md §5.6):
hydra yaml (configs/*.yaml), configargparse (ggrt/config.py) and the
global_cfg singleton. Defaults reproduce configs/pretrain_ggrt_stable.yaml
and configs/pixelsplat/encoder/epipolar.yaml; YAML/CLI overlays are applied
with `load_config` / `apply_overrides`.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Optional


@dataclass
class ImageSelfAttentionCfg:
    patch_size: int = 4
    num_octaves: int = 10
    num_layers: int = 2
    num_heads: int = 4
    d_token: int = 128
    d_dot: int = 128
    d_mlp: int = 256


@dataclass
class EpipolarTransformerCfg:
    self_attention: ImageSelfAttentionCfg = field(default_factory=ImageSelfAttentionCfg)
    num_octaves: int = 10
    num_layers: int = 2
    num_heads: int = 4
    num_samples: int = 32
    num_context_views: int = 2
    d_dot: int = 128
    d_mlp: int = 256
    downscale: int = 4


@dataclass
class BackboneCfg:
    name: str = "resnet"
    model: str = "resnet50"  # dino_resnet50 shares the architecture
    num_layers: int = 5
    use_first_pool: bool = False
    d_out: int = 512
    # Converted torchvision/dino weights (.npz via training/pretrained.py);
    # None or a missing file trains the trunk from scratch.
    pretrained_path: str | None = None


@dataclass
class GaussianAdapterCfg:
    gaussian_scale_min: float = 0.5
    gaussian_scale_max: float = 15.0
    sh_degree: int = 4


@dataclass
class OpacityMappingCfg:
    initial: float = 0.0
    final: float = 0.0
    warm_up: int = 1


@dataclass
class EncoderCfg:
    name: str = "epipolar"
    d_feature: int = 128
    num_monocular_samples: int = 32
    num_surfaces: int = 1
    predict_opacity: bool = False
    near_disparity: float = 3.0
    gaussians_per_pixel: int = 3
    use_epipolar_transformer: bool = True
    use_transmittance: bool = False
    apply_bounds_shim: bool = True
    backbone: BackboneCfg = field(default_factory=BackboneCfg)
    gaussian_adapter: GaussianAdapterCfg = field(default_factory=GaussianAdapterCfg)
    epipolar_transformer: EpipolarTransformerCfg = field(default_factory=EpipolarTransformerCfg)
    opacity_mapping: OpacityMappingCfg = field(default_factory=OpacityMappingCfg)


@dataclass
class DecoderCfg:
    name: str = "splatting"
    backend: str = "pallas"  # pallas | tiled | reference
    max_dup: int = 32
    max_per_tile: int = 1024
    tile_chunk: int = 16


@dataclass
class IPONetCfg:
    pretrained_path: str | None = None  # imagenet resnet18 .npz for the trunks
    iters: int = 12           # total GRU steps (outer x seq_len)
    seq_len: int = 4
    foutput_dim: int = 128
    feat_ratio: int = 8
    hidden_dim: int = 128
    context_dim: int = 32
    min_depth: float = 0.1
    max_depth: float = 100.0


@dataclass
class OptimizerCfg:
    lr: float = 1.5e-4
    warm_up_steps: int = 2000
    # Gradient global-norm clip (0 disables). The reference does not clip,
    # but TPU training showed late gradient spikes -> NaN (ROADMAP.md #1);
    # clipping is the standard production guard.
    grad_clip_norm: float = 5.0


@dataclass
class TrainCfg:
    expname: str = "pretrain_llff"
    rootdir: str = "data/ibrnet/train"
    seed: int = 3407
    ckpt_path: Optional[str] = None

    train_dataset: str = "llff+ibrnet_collected"
    train_scenes: tuple = ()
    dataset_weights: tuple = (0.5, 0.5)
    eval_dataset: str = "llff_test"
    eval_scenes: tuple = ("trex", "fern", "flower", "leaves", "room", "fortress", "horns", "orchids")
    num_source_views: int = 5
    selection_rule: str = "pose"
    llffhold: int = 8
    testskip: int = 8

    n_iters: int = 6000
    lrate_pose: float = 2e-5
    lrate_decay_pose_steps: int = 50000
    lrate_decay_factor: float = 0.5
    use_pred_pose: bool = True
    use_depth_loss: bool = True
    # pose_only extra (off by default, not in the reference recipe): distill
    # the frozen gaussian model's rendered depth into the IPO-Net inverse
    # depths (sup_depth_loss on all iterates, rendered depth as pseudo-GT).
    # The reference only ever trains IPO-Net jointly from step 0, where the
    # photometric loss shapes depth and pose together; when the pose stage
    # starts AFTER a nerf_only stage (our staged recipe), IPO-Net's untrained
    # depth makes the photometric pose gradients noise — the good rendered
    # geometry is sitting right there, so use it.
    pose_depth_distill: float = 0.0
    # Exclude out-of-frame warps from the photometric sfm loss (see
    # losses/photometric.py — OFF matches the reference's zeros-padding
    # semantics; ON removes the black-pixel bias that let round-2 pose
    # translations drift unbounded on synthetic scenes).
    sfm_valid_mask: bool = False
    # Smooth boundary penalty on out-of-frame warp coordinates (see
    # losses/photometric.py oob_weight) — restores the inward gradient that
    # valid_mask removes. 0 = off (reference parity).
    sfm_oob_weight: float = 0.0
    # Teacher-render pose loss weight (pose_only; 0 = off). Renders the
    # CONTEXT views at the PREDICTED cameras from a frozen teacher field
    # (gaussians encoded at the dataset context poses — the same teacher
    # the depth distill already uses) and penalizes photometric error vs
    # the real context images. Gradients reach IPO-Net ONLY through the
    # rasterizer's exact camera VJP (the dcharatan-fork capability), a far
    # wider basin than texture warping: the r4 sweep showed the warp loss
    # floored at its automask level (rotations never left identity) while
    # injecting predicted poses into the ENCODER (pose_render_grad)
    # diverged to R 152 deg — the render-camera path is the signal that
    # remains.
    pose_teacher_weight: float = 0.0
    # Identity-anchor regularizer on the predicted relative-pose vectors,
    # pose_only stage: weight * mean(|vec|^2) over views and iterates.
    # With the warp term off (sfm_weight 0) NOTHING constrains the pose
    # head while depth distillation shifts the shared trunk's features —
    # r4 attempt 3c exploded to pose_vec_norm ~1.2e6 within 500
    # distill-only steps. The anchor pins the head's outputs to identity
    # (no GT poses involved); test-time refinement then descends the warp
    # basin from a clean start. 0 = off.
    pose_anchor_weight: float = 0.0
    # Pose self-distillation weight (pose_only; 0 = off). When a batch
    # carries a "pose_target" entry — per-source-view 6-vec relative poses
    # produced SELF-SUPERVISED by test-time photometric warp refinement
    # (evaluation/harness.py Evaluator.pose_targets: dual-start Adam on the
    # raw pose vecs, no GT poses involved) — IPO-Net regresses them with an
    # iteration-weighted MSE over its GRU iterates. This amortizes the
    # measured-working optimization (r4 matrix: direct warp descent reaches
    # R ~3.5-4 deg from the 8.2-deg identity baseline, while every
    # amortized warp-loss gradient through the network is flat or harmful)
    # into the feed-forward predictor: regression is a well-conditioned
    # objective where the warp loss through the net is not.
    pose_selfdistill_weight: float = 0.0
    # Weight of the photometric warp (sfm) term in the pose_only loss.
    # 1.0 = reference parity. On noise-textured synthetic scenes the warp
    # loss floors at the automask level (r4 flagship attempts 1-2: sfm flat
    # at ~0.8 while rotations never left identity) — 0 lets pose_only train
    # purely from distill + render-gradient terms. Joint-state composition
    # is unaffected (it follows the reference's compose_joint_loss).
    sfm_weight: float = 1.0
    # Let the rgb render loss backprop into the injected predicted poses
    # through the rasterizer's camera gradients (our Pallas VJP computes
    # exact dExtrinsics — the capability the reference's modified CUDA
    # rasterizer advertises but its stable trainer detaches away,
    # train_ggrt_stable.py:106). OFF = reference parity (detach). With it
    # ON in pose_only/joint + use_pred_pose, IPO-Net receives a dense,
    # well-conditioned pose gradient from the render instead of relying
    # solely on the flat photometric warp signal.
    pose_render_grad: bool = False
    # State-machine schedule (train_ggrt_stable.py:83 runs 'joint' live; the
    # commented staged schedule at :78-82 is pose_only -> nerf_only -> joint).
    machine: str = "joint"
    # compose_joint_loss alpha = 2^(-coeff*step) (dgaussian.py:115-121).
    # The reference's 1e-5 only shifts weight onto the gaussian branch after
    # ~100k steps; short runs must raise this or the gaussian branch trains
    # at <1% effective LR for the whole run.
    joint_coefficient: float = 1e-5
    optimizer: OptimizerCfg = field(default_factory=OptimizerCfg)

    # finetune-specific
    crop_size: int = 2  # deferred-BP grid is crop_size x crop_size

    no_load_opt: bool = True
    no_load_scheduler: bool = True
    n_tensorboard: int = 2
    n_checkpoint: int = 500
    n_validation: int = 1000

    # numerics: bf16 default matmul precision NaNs the training step on TPU
    # (ROADMAP.md #1); trainers trace under this precision context.
    matmul_precision: str = "float32"

    # observability: when set, capture a jax.profiler trace of steps
    # [profile_step, profile_step+3) into this directory (xprof/tensorboard
    # readable), the TPU equivalent of the reference's Benchmarker+nsight
    # flow (SURVEY.md §5.1).
    profile_dir: str = ""
    profile_step: int = 10

    # distribution
    data_parallel: int = 1    # device-mesh data axis (target views)
    tile_parallel: int = 1    # device-mesh tile axis (screen tiles)


@dataclass
class GGRtConfig:
    train: TrainCfg = field(default_factory=TrainCfg)
    encoder: EncoderCfg = field(default_factory=EncoderCfg)
    decoder: DecoderCfg = field(default_factory=DecoderCfg)
    iponet: IPONetCfg = field(default_factory=IPONetCfg)


def _apply(obj: Any, overrides: dict) -> Any:
    for key, value in overrides.items():
        head, _, rest = key.partition(".")
        if not hasattr(obj, head):
            raise KeyError(f"unknown config key: {head}")
        if rest:
            _apply(getattr(obj, head), {rest: value})
        else:
            current = getattr(obj, head)
            if dataclasses.is_dataclass(current) and isinstance(value, dict):
                _apply(current, value)
            elif isinstance(current, bool) and isinstance(value, str):
                # bool("False") is True — parse CLI-style strings explicitly.
                low = value.strip().lower()
                if low in ("true", "1", "yes", "on"):
                    setattr(obj, head, True)
                elif low in ("false", "0", "no", "off"):
                    setattr(obj, head, False)
                else:
                    raise ValueError(f"can't parse bool override {head}={value!r}")
            else:
                setattr(obj, head, type(current)(value) if current is not None else value)
    return obj


def apply_overrides(cfg: GGRtConfig, overrides: dict) -> GGRtConfig:
    """Apply {'a.b.c': v} or nested-dict overrides in place."""
    return _apply(cfg, overrides)


def load_config(yaml_path: Optional[str] = None, overrides: Optional[dict] = None) -> GGRtConfig:
    cfg = GGRtConfig()
    if yaml_path is not None:
        import yaml

        with open(yaml_path) as f:
            _apply(cfg, yaml.safe_load(f) or {})
    if overrides:
        apply_overrides(cfg, overrides)
    return cfg


def pretrain_config(**overrides) -> GGRtConfig:
    """configs/pretrain_ggrt_stable.yaml equivalents (the dataclass defaults)."""
    return apply_overrides(GGRtConfig(), overrides)


def finetune_config(**overrides) -> GGRtConfig:
    """configs/finetune_ggrt_stable.yaml equivalents."""
    cfg = GGRtConfig()
    cfg.train.expname = "finetune_dgaussian_stable"
    cfg.train.train_dataset = "llff_test"
    cfg.train.dataset_weights = (1.0,)
    cfg.train.num_source_views = 7
    cfg.train.n_iters = 5000
    cfg.train.use_pred_pose = False
    cfg.train.use_depth_loss = False
    cfg.train.optimizer = OptimizerCfg(lr=5e-5, warm_up_steps=500)
    cfg.train.lrate_decay_pose_steps = 2000
    return apply_overrides(cfg, overrides)
