"""Extract plain state_dicts from a reference LayoutDETR network pickle.

The reference's snapshots are pickles of *live persistent-class
modules* (torch_utils/persistence.py embeds class source into the
pickle), so loading them executes embedded code — run this script ONLY
inside the reference's own environment, against checkpoints you trust
(SURVEY.md §7 hard part 1):

    # in the salesforce/LayoutDETR conda env:
    python tools/extract_reference_pkl.py layoutdetr_ad_banner.pkl out_dir/

It writes ``G_ema.npz`` / ``G.npz`` / ``D.npz`` containing
{param_name: ndarray}. Back in this framework, feed the pieces to
``layoutdetr_tpu.utils.torch_convert`` converters (resnet50 /
bert_encoder / bert_lm_head / layoutnet and the composite mapper) to
produce flax param trees.
"""

from __future__ import annotations

import sys


def main(pkl_path: str, out_dir: str) -> None:
    import os
    import pickle

    import numpy as np

    os.makedirs(out_dir, exist_ok=True)
    with open(pkl_path, "rb") as f:
        data = pickle.load(f)  # executes persistent-class code: trusted env only
    for key in ("G", "D", "G_ema"):
        module = data.get(key)
        if module is None:
            continue
        sd = {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}
        out = os.path.join(out_dir, f"{key}.npz")
        np.savez(out, **sd)
        print(f"wrote {out} ({len(sd)} tensors)")


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(1)
    main(sys.argv[1], sys.argv[2])
