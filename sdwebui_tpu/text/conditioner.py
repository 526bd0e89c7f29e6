"""Prompt → conditioning tensors: unlimited-length chunked CLIP encoding.

Re-implements the observable behaviour of the reference CLIP hijack
(modules/sd_hijack_clip.py): 75-token chunks with BOS/EOS framing, comma
backtracking (opts.comma_padding_backtrack=20), the BREAK keyword, per-token
attention multipliers with mean-renormalized emphasis
(modules/sd_emphasis.py), clip-skip, and textual-inversion splice points —
then assembles the prompt-edit/AND schedules into the device-side
`CondSchedule` banks consumed inside the jitted sampling loop
(the reference's reconstruct_cond_batch → our per-step gather).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List

import jax.numpy as jnp
import numpy as np

from sdwebui_tpu.models import clip as clip_model
from sdwebui_tpu.models.configs import CLIPTextConfig
from sdwebui_tpu.sampling.cfg import CondSchedule
from sdwebui_tpu.text import prompt_parser
from sdwebui_tpu.text.tokenizer import BOS, COMMA, EOS

CHUNK_LEN = 75


@dataclasses.dataclass
class PromptChunk:
    tokens: list          # 75 ids (no specials)
    multipliers: list     # 75 floats
    fixes: list           # (position, embedding_name) TI splice points


def apply_emphasis(z, multipliers, mode: str = "Original"):
    """z: (N,77,D); multipliers: (N,77). Reference modules/sd_emphasis.py."""
    if mode in ("None", "Ignore"):
        return z
    m = multipliers.astype(jnp.float32)[..., None]
    if mode == "No norm":
        return (z.astype(jnp.float32) * m).astype(z.dtype)
    # per-item means: the reference takes one mean over the whole chunk
    # batch (sd_emphasis.py:40), so a prompt's cond depends on what else
    # rode the same encode batch; per-(chunk,line) means match it exactly
    # at batch=1 and keep our deduped encode batching composition-invariant
    original_mean = jnp.mean(z.astype(jnp.float32), axis=(1, 2), keepdims=True)
    zm = z.astype(jnp.float32) * m
    new_mean = jnp.mean(zm, axis=(1, 2), keepdims=True)
    # the reference divides unguarded; a near-zero mean (exact for
    # layer-normed outputs) would poison the run with NaN
    ratio = jnp.where(jnp.abs(new_mean) > 1e-9, original_mean / new_mean, 1.0)
    return (zm * ratio).astype(z.dtype)


class TextConditioner:
    """One text encoder (CLIP-L / OpenCLIP) + tokenizer + options."""

    def __init__(self, params, cfg: CLIPTextConfig, tokenizer,
                 clip_skip: int = 1, emphasis: str = "Original",
                 comma_padding_backtrack: int = 20,
                 apply_final_norm: bool = True,
                 embedding_db=None):
        import jax

        # params live on device from the start: passing host-numpy trees to a
        # jitted call re-uploads them every invocation (measured: dominates
        # end-to-end latency through the TPU tunnel)
        self.params = jax.device_put(params)
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.clip_skip = clip_skip
        self.emphasis = emphasis
        self.comma_padding_backtrack = comma_padding_backtrack
        self.apply_final_norm = apply_final_norm
        self.embedding_db = embedding_db  # textual inversion registry

    # ---- tokenization -------------------------------------------------

    def _token_mults(self):
        """token id → nesting multiplier for vocab entries that contain
        literal paren/bracket characters (reference
        FrozenCLIPEmbedderWithCustomWords.__init__,
        modules/sd_hijack_clip.py:316-340) — the OLD emphasis algorithm
        reads emphasis from tokens, not from a parsed attention tree."""
        cached = getattr(self, "_token_mults_cache", None)
        if cached is not None:
            return cached
        mults = {}
        for text, ident in getattr(self.tokenizer, "encoder", {}).items():
            if not any(c in str(text) for c in "()[]"):
                continue
            m = 1.0
            for c in str(text):
                if c == "[":
                    m /= 1.1
                elif c == "]":
                    m *= 1.1
                elif c == "(":
                    m *= 1.1
                elif c == ")":
                    m /= 1.1
            if m != 1.0:
                mults[ident] = m
        self._token_mults_cache = mults
        return mults

    def _tokenize_line_old(self, line: str):
        """opts.use_old_emphasis_implementation (reference
        modules/sd_hijack_clip_old.py process_text_old, 'you get to stay at
        77'): ONE 75-token window — no chunking, no BREAK, no comma
        backtrack — with literal paren/bracket TOKENS accumulating the
        multiplier and overflow truncated.  Reproduces pre-1.0 seeds."""
        ids = self.tokenizer.encode(line)
        token_mults = self._token_mults()
        tokens: list = []
        mults: list = []
        fixes: list = []
        mult = 1.0
        i = 0
        while i < len(ids):
            token = ids[i]
            change = token_mults.get(token) \
                if getattr(self, "emphasis", "Original") != "None" else None
            emb = None
            if change is not None:
                mult *= change
                i += 1
                continue
            if self.embedding_db is not None:
                emb, emb_len = self.embedding_db.find_at(ids, i)
                if emb is not None:
                    fixes.append((len(tokens), emb))
                    tokens += [0] * emb.vectors
                    mults += [mult] * emb.vectors
                    i += emb_len
                    continue
            tokens.append(token)
            mults.append(mult)
            i += 1
        token_count = len(tokens)
        tokens = tokens[:CHUNK_LEN]
        mults = mults[:CHUNK_LEN]
        fixes = [(p, e) for (p, e) in fixes if p < CHUNK_LEN]
        tokens += [EOS] * (CHUNK_LEN - len(tokens))
        mults += [1.0] * (CHUNK_LEN - len(mults))
        return [PromptChunk(tokens, mults, fixes)], token_count

    def tokenize_line(self, line: str):
        """line → (List[PromptChunk], token_count). Reference
        sd_hijack_clip.py:81 semantics."""
        from sdwebui_tpu.utils.options import opts as _opts

        if bool(_opts.get("use_old_emphasis_implementation", False)):
            return self._tokenize_line_old(line)
        parsed = prompt_parser.parse_prompt_attention(line)

        chunks: List[PromptChunk] = []
        tokens: list = []
        mults: list = []
        fixes: list = []
        last_comma = -1
        token_count = 0

        def next_chunk(is_last=False):
            nonlocal tokens, mults, fixes, token_count
            if is_last:
                token_count += len(tokens)
            else:
                token_count += CHUNK_LEN
            to_add = CHUNK_LEN - len(tokens)
            if to_add > 0:
                tokens += [EOS] * to_add
                mults += [1.0] * to_add
            chunks.append(PromptChunk(tokens, mults, fixes))
            tokens, mults, fixes = [], [], []

        for text, weight in parsed:
            if text == "BREAK" and weight == -1:
                next_chunk()
                continue

            ids = self.tokenizer.encode(text)
            position = 0
            while position < len(ids):
                token = ids[position]

                if token == COMMA:
                    last_comma = len(tokens)
                elif (self.comma_padding_backtrack != 0 and len(tokens) == CHUNK_LEN
                        and last_comma != -1
                        and len(tokens) - last_comma <= self.comma_padding_backtrack):
                    # move everything since the last comma to the next chunk
                    break_location = last_comma + 1
                    reloc_tokens = tokens[break_location:]
                    reloc_mults = mults[break_location:]
                    tokens = tokens[:break_location]
                    mults = mults[:break_location]
                    next_chunk()
                    tokens = reloc_tokens
                    mults = reloc_mults
                    last_comma = -1

                if len(tokens) == CHUNK_LEN:
                    next_chunk()
                    last_comma = -1

                emb = None
                if self.embedding_db is not None:
                    emb, emb_len = self.embedding_db.find_at(ids, position)
                    if emb is not None:
                        if len(tokens) + emb.vectors > CHUNK_LEN:
                            next_chunk()
                            last_comma = -1
                        fixes.append((len(tokens), emb))
                        tokens += [0] * emb.vectors
                        mults += [weight] * emb.vectors
                        position += emb_len
                        continue

                tokens.append(token)
                mults.append(weight)
                position += 1

        if tokens or not chunks:
            next_chunk(is_last=True)

        return chunks, token_count

    # ---- encoding -----------------------------------------------------

    def encode(self, lines: List[str], target_chunks: int | None = None):
        """lines → (cond (B, 77*C, D), pooled (B, Dp)).

        All lines padded to a common chunk count (and optionally to
        `target_chunks` — the reference's pad_cond for mismatched
        cond/uncond lengths)."""
        per_line = [self.tokenize_line(line) for line in lines]
        n_chunks = max(max(len(c) for c, _ in per_line), target_chunks or 1)

        empty_chunk = PromptChunk([EOS] * CHUNK_LEN, [1.0] * CHUNK_LEN, [])
        all_tokens, all_mults, all_fixes = [], [], []
        for chunks, _ in per_line:
            chunks = chunks + [empty_chunk] * (n_chunks - len(chunks))
            for ci, ch in enumerate(chunks):
                all_tokens.append([BOS] + ch.tokens + [EOS])
                all_mults.append([1.0] + ch.multipliers + [1.0])
                all_fixes.append(ch.fixes)

        token_arr = jnp.asarray(np.asarray(all_tokens, np.int32))
        mult_arr = jnp.asarray(np.asarray(all_mults, np.float32))

        x = clip_model.encode_with_fixes(
            self.params, self.cfg, token_arr, all_fixes,
            stop_at_layer=self.clip_skip - 1,
            apply_final_norm=self.apply_final_norm)
        hidden, pooled = x
        hidden = apply_emphasis(hidden, mult_arr, self.emphasis)

        b = len(lines)
        d = hidden.shape[-1]
        cond = hidden.reshape(b, n_chunks * (CHUNK_LEN + 2), d)
        pooled = pooled.reshape(b, n_chunks, -1)[:, 0]  # first chunk's EOT pool
        return cond, pooled


# ==========================================================================
# schedules → CondSchedule banks
# ==========================================================================

def build_cond_schedule(encode_fn: Callable, prompt: str, negative_prompt: str,
                        steps: int, cond_scale: float = 7.5,
                        skip_uncond_steps=None,
                        vector_maker: Callable | None = None,
                        hires_steps: int | None = None,
                        use_old_scheduling: bool = False) -> CondSchedule:
    """Parse prompt-edit/AND syntax, encode every unique schedule text once,
    assemble device banks + per-step index tables.

    encode_fn(list_of_texts) -> (B, S, D) cond array, or (cond, pooled) when
    the model produces pooled embeddings (SDXL dual-encoder).
    vector_maker(pooled (N,Dp), is_uncond_row (N,) bool) -> (N, D_adm)
    builds the SDXL y vectors (pooled + size/crop sinusoid embeds).
    """
    subprompts = prompt_parser.split_multicond(prompt)
    k = len(subprompts)

    pos_scheds = [prompt_parser.get_prompt_schedule(
        sp.text, steps, hires_steps, use_old_scheduling) for sp in subprompts]
    neg_sched = prompt_parser.get_prompt_schedule(
        negative_prompt, steps, hires_steps, use_old_scheduling)
    # new-style hires scheduling continues past the first pass: the step
    # tables below index the SECOND pass's steps (reference
    # prompt_parser.py:66-83 via opts.use_old_scheduling)
    if hires_steps is not None and not use_old_scheduling:
        steps = hires_steps

    # encode all texts in one batch so chunk counts match everywhere
    texts = [t for sched in pos_scheds for _, t in sched] + [t for _, t in neg_sched]
    enc = encode_fn(texts)
    pooled = None
    if isinstance(enc, tuple):
        enc, pooled = enc
    conds = enc                       # (total, S, D) — stays on device

    # bank assembly = one device gather (no per-row host fetches)
    max_sched = max(max(len(s) for s in pos_scheds), 1)
    row_ids = np.zeros((k, max_sched), np.int32)
    cond_idx = np.zeros((k, steps), np.int32)
    ptr = 0
    for ki, sched in enumerate(pos_scheds):
        for si in range(max_sched):
            row_ids[ki, si] = ptr + min(si, len(sched) - 1)
        ptr += len(sched)
        # per-step entry: first schedule item with end_at_step >= step (1-based)
        si = 0
        for step in range(1, steps + 1):
            while si < len(sched) - 1 and sched[si][0] < step:
                si += 1
            cond_idx[ki, step - 1] = si
    cond_bank = conds[jnp.asarray(row_ids)]

    n_u = len(neg_sched)
    uncond_bank = conds[ptr: ptr + n_u]
    uncond_idx = np.zeros((steps,), np.int32)
    si = 0
    for step in range(1, steps + 1):
        while si < n_u - 1 and neg_sched[si][0] < step:
            si += 1
        uncond_idx[step - 1] = si

    vector_bank = vector_uncond_bank = None
    if pooled is not None and vector_maker is not None:
        n_total = pooled.shape[0]
        is_uncond = np.zeros((n_total,), bool)
        is_uncond[ptr:] = True
        vectors = vector_maker(pooled, jnp.asarray(is_uncond))   # (total, D_adm)
        vector_bank = vectors[jnp.asarray(row_ids)]              # (K, max_sched, D)
        vector_uncond_bank = vectors[ptr: ptr + n_u]

    return CondSchedule(
        cond_bank=cond_bank,
        vector_bank=vector_bank,
        vector_uncond_bank=vector_uncond_bank,
        cond_idx=jnp.asarray(cond_idx),
        cond_weights=jnp.asarray([sp.weight for sp in subprompts], jnp.float32),
        uncond_bank=uncond_bank,
        uncond_idx=jnp.asarray(uncond_idx),
        cond_scale=cond_scale,
        skip_uncond=None if skip_uncond_steps is None else jnp.asarray(skip_uncond_steps),
    )
