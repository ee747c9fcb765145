"""Convert reference PyTorch checkpoints into crfp_tpu flax param trees.

Covers the reference's checkpoint surface (SURVEY.md §5.4):
- model checkpoints ``model_{epoch}_{iter}.pt`` saved by the trainer with
  the ``module.`` prefix stripped (/root/reference/trainer.py:276-280);
- the ``basic_`` -> ``basic_module.`` SPyNet key remap applied at load
  (/root/reference/trainer.py:193);
- pretrained flow nets ``fnet.pth`` / ``spynet_*.pth``.

Layout transforms:
- conv weights OIHW -> HWIO;
- the DCNv2 kernel likewise (our deform_conv2d takes HWIO);
- offset/mask head weights transfer untouched: the torch packed channel
  order (g, tap, (y,x)) for offsets and (g, tap) for masks equals the
  reshape order used in crfp_tpu.nn.align.DCNAlign, and the repeat-mode
  (2, g) order matches its transpose;
- PixelShuffle/Unshuffle channel orders match torch, so the packing convs
  transfer untouched (see crfp_tpu/ops/shuffle.py).
"""

from __future__ import annotations

from typing import Any

import numpy as np


def _oihw_to_hwio(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _set(tree: dict, path: list[str], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


_SEQ2NAME_FNET = {
    # torch Sequential index -> flax Conv name, for each FNet block
    "encoder1": {"0": "encoder1_conv1", "2": "encoder1_conv2"},
    "encoder2": {"0": "encoder2_conv1", "2": "encoder2_conv2"},
    "encoder3": {"0": "encoder3_conv1", "2": "encoder3_conv2"},
    "decoder1": {"0": "decoder1_conv1", "2": "decoder1_conv2"},
    "decoder2": {"0": "decoder2_conv1", "2": "decoder2_conv2"},
    "decoder3": {"0": "decoder3_conv1", "2": "decoder3_conv2"},
    "flow": {"0": "flow_conv1", "2": "flow_conv2"},
}


def _map_fnet(rest: list[str]) -> list[str] | None:
    # e.g. ['encoder1', '0', 'weight']
    block, idx, leaf = rest
    name = _SEQ2NAME_FNET[block][idx]
    return [name, "conv", {"weight": "kernel", "bias": "bias"}[leaf]]


def _map_spynet(rest: list[str]) -> list[str] | None:
    # reference: basic_module.{L}.basic_module.{j}.conv.{weight,bias}
    # (after the trainer's basic_ -> basic_module. remap)
    assert rest[0] == "basic_module"
    level, _, j, _, leaf = rest[1], rest[2], rest[3], rest[4], rest[5]
    return [f"basic_module{level}", f"conv{j}", "conv",
            {"weight": "kernel", "bias": "bias"}[leaf]]


def _map_dcn(rest: list[str]) -> tuple[list[str], bool] | None:
    """Returns (flax path, is_conv_weight)."""
    leaf = rest[-1]
    kind = {"weight": "kernel", "bias": "bias"}[leaf]
    head = rest[0]
    if head == "dcn_block":
        return ([f"dcn_block_conv{int(rest[1]) // 2 + 1}", "conv", kind], leaf == "weight")
    if head.isdigit():
        # no_dcn variant: dcn_i is a plain Sequential (CRFP.py:2029-2052)
        return ([f"conv{int(head) // 2 + 1}", "conv", kind], leaf == "weight")
    if head in ("dcn_offset", "dcn_mask", "conv_fuse"):
        return ([head, "conv", kind], leaf == "weight")
    if head == "dcn":
        return (["dcn_weight" if leaf == "weight" else "dcn_bias"], leaf == "weight")
    if head == "upsample":
        return (["upsample", "upsample_conv", "conv", kind], leaf == "weight")
    return None


def _map_lte(rest: list[str]) -> list[str]:
    leaf = {"weight": "kernel", "bias": "bias"}[rest[-1]]
    if rest[0].startswith("slice"):
        return [f"{rest[0]}_conv{int(rest[1]) // 2 + 1}", "conv", leaf]
    if rest[0].startswith("conv_lv"):
        return [rest[0], "conv", leaf]
    raise KeyError(rest)


def _map_resblocks(rest: list[str], stitching: bool = False) -> list[str] | None:
    """Batch-model naming: main.0 = input conv, main.2.{i}.conv{1,2} =
    residual blocks. Runtime-model naming (CRFP_runtime.py:464-556):
    conv1 (+ dead conv2 on the cold-start blocks), main.1.{i}.conv{1,2}.
    ``stitching``: the _v2 block — conv1/conv2 both live, mapped to the
    flax ResidualBlocksWithInputConvV2 names. Returns None for the
    reference's dead parameters (cold-start conv2)."""
    leaf = {"weight": "kernel", "bias": "bias"}[rest[-1]]
    if rest[0] == "conv1":
        return (["conv1", "conv", leaf] if stitching else ["input_conv", "conv", leaf])
    if rest[0] == "conv2":
        return (["conv2", "conv", leaf] if stitching else None)
    assert rest[0] == "main"
    if rest[1] == "0":
        return ["input_conv", "conv", leaf]
    if rest[1] == "1":  # runtime naming: main = [lrelu, blocks]
        return [f"block{rest[2]}", rest[3], "conv", leaf]
    assert rest[1] == "2"
    return [f"block{rest[2]}", rest[3], "conv", leaf]


def convert_state_dict(state_dict: dict[str, Any], strict: bool = True) -> dict:
    """torch name->tensor dict (numpy or torch tensors) -> flax {'params': ...}."""
    params: dict = {}
    unused = []
    for key, val in state_dict.items():
        if hasattr(val, "detach"):
            val = val.detach()
        v = np.asarray(getattr(val, "numpy", lambda: val)()).astype(np.float32)
        # strip only the LEADING DataParallel prefix. (The reference strips
        # with a naive substring replace at save time, trainer.py:278, which
        # mangles 'basic_module.' into 'basic_' — that is exactly why its
        # loader needs the basic_ -> basic_module. remap below.)
        if key.startswith("module."):
            key = key[len("module.") :]
        if "basic_" in key and "basic_module." not in key:
            key = key.replace("basic_", "basic_module.")
        parts = key.split(".")
        top = parts[0]
        rest = parts[1:]
        try:
            if top == "spynet":
                if rest[0] == "basic_module":
                    path = ["spynet"] + _map_spynet(rest)
                elif rest[0] in ("mean", "std"):
                    continue  # constants baked into the module
                else:
                    path = ["spynet"] + _map_fnet(rest)
                is_w = parts[-1] == "weight"
            elif top.startswith("dcn_") and top[-4:-1] == "_lv" and top[-1].isdigit():
                # gen-1 pyramid flat naming (CRFP_runtime.py:1570-1627):
                # dcn_pre_lvK / dcn_block_lvK.{1,3} / dcn_offset_lvK /
                # dcn_mask_lvK / dcn_lvK -> params under align_lvK
                lv = top[-1]
                kind = {"weight": "kernel", "bias": "bias"}[parts[-1]]
                is_w = parts[-1] == "weight"
                if top.startswith("dcn_block_lv"):
                    # Sequential(lrelu, conv, lrelu, conv, lrelu): 1->conv1, 3->conv2
                    path = [f"align_lv{lv}",
                            f"{top}_conv{(int(rest[0]) - 1) // 2 + 1}", "conv", kind]
                elif top.startswith(("dcn_pre_lv", "dcn_offset_lv", "dcn_mask_lv")):
                    path = [f"align_lv{lv}", top, "conv", kind]
                else:  # dcn_lvK: the DCNv2 weight/bias params
                    assert top == f"dcn_lv{lv}", key
                    path = [f"align_lv{lv}",
                            f"dcn_weight_lv{lv}" if is_w else f"dcn_bias_lv{lv}"]
            elif top.startswith("dcn_"):
                mapped = _map_dcn(rest)
                if mapped is None:
                    raise KeyError(key)
                sub, is_w = mapped
                path = [top] + sub
            elif top in ("encoder_lr", "encoder_hr"):
                path = [top] + _map_lte(rest)
                is_w = parts[-1] == "weight"
            elif top.startswith("forward_resblocks"):
                # runtime stitching blocks (no trailing underscore, _v2
                # naming) keep conv1/conv2; cold-start blocks' dead conv2
                # is skipped (CRFP_runtime.py:481 — params exist unused)
                # the gen-1 pyramid's blocks (forward_resblocks_lv{k}) are
                # the runtime-file class whose conv2 is DEAD (the in//3
                # latent bug, CRFP_runtime.py:481) — non-stitching mapping
                pyramid = top[-4:-1] == "_lv" and top[-1].isdigit()
                stitching = (not top.endswith("_") and not pyramid
                             and rest[0] in ("conv1", "conv2"))
                mapped = _map_resblocks(rest, stitching=stitching)
                if mapped is None:
                    continue
                path = [top] + mapped
                is_w = parts[-1] == "weight"
            elif top in ("downsample",):
                path = [top, "downsample_conv", "conv",
                        {"weight": "kernel", "bias": "bias"}[parts[-1]]]
                is_w = parts[-1] == "weight"
            elif top in ("upsample", "upsample_post") or (
                    top.startswith("upsample") and top[-1].isdigit()):
                # upsample0/1/2: the gen-1 pyramid's per-level 2x packs
                path = [top, "upsample_conv", "conv",
                        {"weight": "kernel", "bias": "bias"}[parts[-1]]]
                is_w = parts[-1] == "weight"
            elif top.startswith(("conv_tttf", "conv_last", "conv_hr")):
                path = [top, "conv", {"weight": "kernel", "bias": "bias"}[parts[-1]]]
                is_w = parts[-1] == "weight"
            else:
                raise KeyError(key)
        except KeyError:
            if strict:
                raise
            unused.append(key)
            continue
        if is_w and v.ndim == 4:
            v = _oihw_to_hwio(v)
        _set(params, path, v)
    if unused:
        print(f"convert_state_dict: skipped {len(unused)} unmapped keys: {unused[:8]}...")
    return {"params": params}


def load_torch_checkpoint(path: str, strict: bool = True) -> dict:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]
    return convert_state_dict(sd, strict=strict)


def main():
    """CLI: convert a reference .pt/.pth checkpoint to an orbax directory.

    Usage: python -m crfp_tpu.tools.convert_torch ckpt.pt out_dir [--lenient]
    """
    import argparse
    import os

    import jax
    import orbax.checkpoint as ocp

    p = argparse.ArgumentParser()
    p.add_argument("ckpt")
    p.add_argument("out_dir")
    p.add_argument("--lenient", action="store_true",
                   help="skip unmapped keys instead of failing")
    args = p.parse_args()

    params = load_torch_checkpoint(args.ckpt, strict=not args.lenient)
    n = sum(x.size for x in jax.tree.leaves(params))
    ocp.StandardCheckpointer().save(
        os.path.abspath(args.out_dir), {"params": params}, force=True
    )
    print(f"converted {args.ckpt} -> {args.out_dir} ({n:,} parameters)")


if __name__ == "__main__":
    main()
