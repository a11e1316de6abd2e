"""CLIP text tokenization (byte-pair encoding).

Behavioral counterpart of open_clip's SimpleTokenizer as consumed by the
reference's text embedders (sgm/modules/encoders/modules.py:516-523 calls
`open_clip.tokenize`): lowercased, whitespace-cleaned text is pre-tokenized
with CLIP's regex, mapped through the byte→unicode table, merged by BPE rank
with `</w>` end-of-word markers, and framed as [SOT, ids..., EOT] padded to
77 (truncating over-long prompts with EOT forced into the last slot).

The 49,408-entry production vocab comes from open_clip's
`bpe_simple_vocab_16e6.txt.gz` (not vendorable here — no network egress);
`tokenize(..., bpe_path=...)` or $VIDSEG_BPE_PATH points at it in a real
deployment. The VidSeg SD pipelines themselves condition on the EMPTY prompt
only (sd_pipeline_vspw.py:277-307), whose token ids are fixed and need no
vocab. A tiny vendored merges table (assets/bpe_tiny_test_vocab.txt.gz)
exercises the algorithm in CI.

Deviation: open_clip also runs `ftfy.fix_text` (mojibake repair) before
cleaning; ftfy is not in this image, so it is applied only when importable.
For ASCII prompts ftfy is an identity transform.
"""

from __future__ import annotations

import functools
import gzip
import html
import os
from typing import List, Optional, Sequence

import numpy as np

SOT = 49406
EOT = 49407
CONTEXT_LENGTH = 77

_TINY_VOCAB = os.path.join(
    os.path.dirname(os.path.dirname(__file__)), "assets", "bpe_tiny_test_vocab.txt.gz"
)


@functools.lru_cache()
def bytes_to_unicode():
    """The reversible byte→printable-unicode map BPE vocabs are written in
    (GPT-2/CLIP convention): printable bytes map to themselves, the rest to
    256+n codepoints."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(2**8):
        if b not in bs:
            bs.append(b)
            cs.append(2**8 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


def _get_pairs(word):
    return {(a, b) for a, b in zip(word, word[1:])}


def _basic_clean(text: str) -> str:
    try:
        import ftfy

        text = ftfy.fix_text(text)
    except ImportError:
        pass
    return html.unescape(html.unescape(text)).strip()


def _whitespace_clean(text: str) -> str:
    return " ".join(text.split())


class ClipBPETokenizer:
    """BPE encoder over a CLIP-format merges file.

    `bpe_path`: plain or gzipped merges list — first line is a header, each
    following line one space-separated merge pair, highest priority first.
    The derived vocab is [256 byte symbols, 256 byte</w> symbols, merges...,
    SOT, EOT]; with the production 48,894-merge file that yields the
    49,408-id layout (SOT=49406, EOT=49407) the reference's text towers
    expect."""

    def __init__(self, bpe_path: str, context_length: int = CONTEXT_LENGTH):
        import regex

        self.context_length = context_length
        opener = gzip.open if bpe_path.endswith(".gz") else open
        with opener(bpe_path, "rb") as f:
            lines = f.read().decode("utf-8").split("\n")
        # production file: merges[1 : 49152-256-2+1]; smaller test vocabs
        # take every well-formed line after the header
        merges = [tuple(m.split()) for m in lines[1 : 49152 - 256 - 2 + 1]]
        merges = [m for m in merges if len(m) == 2]

        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        vocab = list(self.byte_encoder.values())
        vocab += [v + "</w>" for v in vocab]
        vocab += ["".join(m) for m in merges]
        vocab += ["<start_of_text>", "<end_of_text>"]
        self.encoder = dict(zip(vocab, range(len(vocab))))
        self.decoder = {v: k for k, v in self.encoder.items()}
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.sot = self.encoder["<start_of_text>"]
        self.eot = self.encoder["<end_of_text>"]
        # open_clip seeds the cache with {t: t} so literal special tokens
        # in input text stay atomic (map to their single vocab id) instead
        # of being byte-split by _bpe
        self._cache = {
            "<start_of_text>": "<start_of_text>",
            "<end_of_text>": "<end_of_text>",
        }
        self._pat = regex.compile(
            r"""<start_of_text>|<end_of_text>|'s|'t|'re|'ve|'m|'ll|'d|"""
            r"""[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
            regex.IGNORECASE,
        )

    def _bpe(self, token: str) -> str:
        if token in self._cache:
            return self._cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if word[i] == first and i < len(word) - 1 and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        out = " ".join(word)
        self._cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        text = _whitespace_clean(_basic_clean(text)).lower()
        for token in self._pat.findall(text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self._bpe(token).split(" "))
        return ids

    def decode(self, ids: Sequence[int]) -> str:
        text = "".join(self.decoder.get(int(i), "") for i in ids)
        raw = bytearray(self.byte_decoder[c] for c in text if c in self.byte_decoder)
        return raw.decode("utf-8", errors="replace").replace("</w>", " ")

    def __call__(
        self, texts: Sequence[str], context_length: Optional[int] = None
    ) -> np.ndarray:
        n = context_length or self.context_length
        out = np.zeros((len(texts), n), dtype=np.int32)
        for row, text in enumerate(texts):
            ids = [self.sot] + self.encode(text) + [self.eot]
            if len(ids) > n:  # truncate, EOT forced into the last slot
                ids = ids[:n]
                ids[-1] = self.eot
            out[row, : len(ids)] = ids
        return out


def default_bpe_path() -> Optional[str]:
    """Production vocab discovery: $VIDSEG_BPE_PATH, then the conventional
    checkpoint-directory locations."""
    cands = [os.environ.get("VIDSEG_BPE_PATH")]
    for root in ("checkpoints", os.path.expanduser("~/.cache/vidseg")):
        cands.append(os.path.join(root, "bpe_simple_vocab_16e6.txt.gz"))
    for c in cands:
        if c and os.path.exists(c):
            return c
    return None


@functools.lru_cache(maxsize=4)
def _tokenizer(bpe_path: str) -> ClipBPETokenizer:
    return ClipBPETokenizer(bpe_path)


def tokenize_empty(batch: int = 1, context_length: int = CONTEXT_LENGTH) -> np.ndarray:
    """Empty-prompt ids under the production vocab layout — fixed, no vocab
    file needed (the only prompt the VidSeg pipelines use)."""
    tokens = np.zeros((batch, context_length), dtype=np.int32)
    tokens[:, 0] = SOT
    tokens[:, 1] = EOT
    return tokens


def tokenize(
    texts: Sequence[str],
    context_length: int = CONTEXT_LENGTH,
    bpe_path: Optional[str] = None,
) -> np.ndarray:
    """open_clip.tokenize semantics: [SOT, BPE ids..., EOT] zero-padded to
    `context_length`. Empty prompts never need a vocab file; non-empty
    prompts use `bpe_path` (or the discovered production vocab)."""
    if all(t.strip() == "" for t in texts):
        return tokenize_empty(len(texts), context_length)
    path = bpe_path or default_bpe_path()
    if path is None:
        raise ValueError(
            "non-empty prompts need the CLIP BPE vocab "
            "(bpe_simple_vocab_16e6.txt.gz): pass bpe_path= or set "
            "$VIDSEG_BPE_PATH"
        )
    return _tokenizer(path)(texts, context_length)
