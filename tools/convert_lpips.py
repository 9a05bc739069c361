"""Convert canonical LPIPS (net-lin alex v0.1) weights to the .npz format
nlt_tpu.losses.lpips loads.

The reference consumes a frozen TF1 GraphDef downloaded separately
(reference: nlt/losses.py:121-140; the .pb is not vendored). This tool
accepts either source when you have one:

1. the torch `lpips` package checkpoint:
       python tools/convert_lpips.py --torch_lpips --out=lpips_alex.npz
   (requires `pip install lpips` + torchvision weights — network access)
2. a torch state_dict file with AlexNet features + lin heads:
       python tools/convert_lpips.py --state_dict=<.pt> --out=...
3. the TF frozen graph:
       python tools/convert_lpips.py --pb=net-lin_alex_v0.1.pb --out=...
   (requires tensorflow)

Output keys: conv{i}_w (k, k, in, out), conv{i}_b (out,), lin{i}_w (C,).
Then set `lpips_weights = /path/to/out.npz` in the experiment .ini.
"""

import argparse

import numpy as np

parser = argparse.ArgumentParser(description=__doc__)
parser.add_argument("--torch_lpips", action="store_true")
parser.add_argument("--state_dict", type=str, default=None)
parser.add_argument("--pb", type=str, default=None)
parser.add_argument("--out", type=str, required=True)

# AlexNet feature-extractor conv layer indices in torchvision's
# features Sequential: conv layers at 0, 3, 6, 8, 10.
_TORCH_FEATURE_IDXS = [0, 3, 6, 8, 10]


def from_torch_lpips(out_path):
    import lpips as lpips_pkg  # noqa: F401

    net = lpips_pkg.LPIPS(net="alex")
    save = {}
    convs = [m for m in net.net.slice1] + [m for m in net.net.slice2] + \
        [m for m in net.net.slice3] + [m for m in net.net.slice4] + \
        [m for m in net.net.slice5]
    import torch.nn as nn
    conv_layers = [m for m in convs if isinstance(m, nn.Conv2d)]
    assert len(conv_layers) == 5
    for i, conv in enumerate(conv_layers):
        # torch OIHW -> HWIO
        save["conv%d_w" % i] = conv.weight.detach().numpy().transpose(
            2, 3, 1, 0)
        save["conv%d_b" % i] = conv.bias.detach().numpy()
    for i, lin in enumerate(net.lins):
        w = lin.model[-1].weight.detach().numpy()  # (1, C, 1, 1)
        save["lin%d_w" % i] = w.reshape(-1)
    np.savez(out_path, **save)
    print("Wrote", out_path)


def from_state_dict(path, out_path):
    import torch

    sd = torch.load(path, map_location="cpu")
    save = {}
    conv_keys = [k for k in sd if k.endswith(".weight")
                 and sd[k].dim() == 4 and "lin" not in k]

    def numeric_key(k):
        # torchvision naming 'features.10.weight' must order 10 AFTER 3
        # (lexicographic sort puts it before, scrambling the layers).
        return [int(p) if p.isdigit() else p for p in k.split(".")]

    conv_keys = sorted(conv_keys, key=numeric_key)[:5]
    # Validate the AlexNet channel chain 3->64->192->384->256->256.
    chain = [tuple(sd[k].shape[:2]) for k in conv_keys]  # (out, in)
    expect = [(64, 3), (192, 64), (384, 192), (256, 384), (256, 256)]
    assert chain == expect, (
        "Unexpected conv chain %s (want %s); check the state_dict "
        "naming" % (chain, expect))
    for i, k in enumerate(conv_keys):
        save["conv%d_w" % i] = sd[k].numpy().transpose(2, 3, 1, 0)
        bk = k[:-len("weight")] + "bias"
        save["conv%d_b" % i] = sd[bk].numpy()
    lin_keys = sorted(
        (k for k in sd if "lin" in k and k.endswith(".weight")),
        key=numeric_key)
    assert len(lin_keys) >= 5, "Could not find linear head weights"
    # Heads must match the tap channel counts in order.
    lin_chain = [int(np.prod(sd[k].shape)) for k in lin_keys[:5]]
    assert lin_chain == [64, 192, 384, 256, 256], lin_chain
    for i, k in enumerate(lin_keys[:5]):
        save["lin%d_w" % i] = sd[k].numpy().reshape(-1)
    np.savez(out_path, **save)
    print("Wrote", out_path)


def from_pb(path, out_path):
    import tensorflow as tf

    graph_def = tf.compat.v1.GraphDef()
    with open(path, "rb") as h:
        graph_def.ParseFromString(h.read())
    consts = {}
    for node in graph_def.node:
        if node.op == "Const":
            consts[node.name] = tf.make_ndarray(node.attr["value"].tensor)
    conv_ws = sorted(
        (k for k, v in consts.items() if v.ndim == 4 and v.shape[0] > 1),
        key=lambda k: -np.prod(consts[k].shape))
    # Identify the 5 AlexNet convs by their kernel shapes.
    shapes = {(11, 11): 0, (5, 5): 1}
    save = {}
    three_by = []
    for k in conv_ws:
        v = consts[k]
        hw = tuple(v.shape[:2])
        if hw in shapes:
            i = shapes[hw]
            save["conv%d_w" % i] = v
        elif hw == (3, 3):
            three_by.append((k, v))
    three_by.sort(key=lambda kv: kv[1].shape[2], reverse=True)
    # conv3: 192->384, conv4: 384->256, conv5: 256->256
    by_io = {(192, 384): 2, (384, 256): 3, (256, 256): 4}
    for k, v in three_by:
        io = (v.shape[2], v.shape[3])
        if io in by_io:
            save["conv%d_w" % by_io[io]] = v
    # Conv biases: 1-D consts matching each conv's output width, taken
    # in graph order per width (AlexNet widths repeat only for the two
    # 256-wide convs, whose biases appear in graph order).
    bias_pool = [(k, v) for k, v in consts.items() if v.ndim == 1]
    for i in range(5):
        width = save["conv%d_w" % i].shape[3]
        match = next(
            ((k, v) for k, v in bias_pool if v.shape[0] == width), None)
        assert match is not None, (
            "No bias const of width %d for conv%d in the graph — "
            "refusing to write zeros silently" % (width, i))
        save["conv%d_b" % i] = match[1]
        bias_pool.remove(match)

    # Lin heads: one per tap, identified by the tap's channel count.
    # The two 256-channel stages are disambiguated by graph order.
    lin_ws = [v for k, v in sorted(consts.items())
              if v.ndim == 4 and v.shape[:2] == (1, 1) and v.shape[3] == 1]
    tap_chs = [save["conv%d_w" % i].shape[3] for i in range(5)]
    for i, ch in enumerate(tap_chs):
        match = next((v for v in lin_ws if v.shape[2] == ch), None)
        assert match is not None, (
            "No lin head with %d channels for stage %d" % (ch, i))
        save["lin%d_w" % i] = np.abs(match.reshape(-1))
        lin_ws.remove(match)
    np.savez(out_path, **save)
    print("Wrote", out_path)


def main(args):
    if args.torch_lpips:
        from_torch_lpips(args.out)
    elif args.state_dict:
        from_state_dict(args.state_dict, args.out)
    elif args.pb:
        from_pb(args.pb, args.out)
    else:
        raise SystemExit("Provide one of --torch_lpips/--state_dict/--pb")


if __name__ == "__main__":
    main(parser.parse_args())
