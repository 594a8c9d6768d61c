"""Continuous-batching serving engine over the paged KV cache.

The host-side runtime that turns the Pallas paged decode kernel
(vats_tpu/ops/decode_attention.py) into an actual serving system — the role
vLLM's scheduler/BlockManager plays around PagedAttention, which the
reference lacks entirely (its generate loop re-concatenates python tensors
per token and serves one fixed batch,
/root/reference/src/transformers/nlp/inference/generate.py:102-236):

  * :class:`PageAllocator` — a free-list over the PHYSICAL page pool.
    Sequences allocate pages on demand (prompt pages at admission, one page
    at a time as decode crosses page boundaries) and return them on
    retirement, so the pool is sized for the *working set*, not
    max_batch * max_context.
  * :class:`ServingEngine` — admission queue + row scheduler.  Requests
    join any free batch row (prompt lengths bucketed to bound compiles),
    decode steps run the WHOLE batch through one jitted step (inactive rows
    ride along against a reserved scratch page), and finished rows retire
    and free their pages mid-flight while the rest keep decoding —
    continuous batching with static shapes, the TPU-native constraint.
  * :class:`PrefixCache` — automatic prefix caching (vLLM-style): full
    prompt pages are content-addressed by a chained hash of their tokens;
    a new request whose prompt prefix matches cached pages maps them into
    its page table (refcounted) and prefills ONLY the uncached tail at the
    matching sequence offset (the paged attention path natively supports
    prefill at lengths > 0).  Retired pages park in an LRU pool and are
    reclaimed only under memory pressure, so repeated system prompts cost
    one prefill total.  Only FULL pages are ever shared, so shared pages
    are immutable — no copy-on-write needed (decode always writes to the
    private tail page).

Design notes for the jit boundary:
  * one prefill program per prompt bucket, one decode program total; page
    tables and lengths are DATA (scalar-prefetch in the kernel), so page
    allocation never recompiles anything.
  * the pool (and int8 scales pool) is donated through every call — the
    kernel's input_output_aliases keep the update in place under jit.
  * per-step host sync is inherent to continuous batching (the scheduler
    must see tokens to retire/admit); ``decode_block_steps=k`` amortizes
    it by running k decode steps in ONE jitted fori_loop program and
    syncing the scheduler once per block.  Rows that hit EOS or their
    token budget mid-block decode a few wasted tokens past the end; the
    host truncates their outputs and lengths, and the over-committed KV
    positions (all >= the corrected length) are never attended and are
    overwritten by later commits.  Near the context cap the engine falls
    back to single steps so a block can never run a row past its page
    table.
  * ``spec_k`` enables SPECULATIVE DECODING with prompt-lookup (n-gram)
    drafts: the host proposes k continuation tokens by matching the tail
    n-gram of each row's context against its own history, and ONE paged
    forward over [B, k+1] tokens verifies all of them (the same
    nonzero-offset path tail prefills use).  Greedy acceptance takes the
    longest drafted prefix whose argmax agrees, plus the model's first
    correction — 1..k+1 tokens per model call.  Rejected drafts need no
    KV rollback: their commits sit at positions >= the corrected length,
    are never attended, and the next verify window (which always starts
    at the corrected length and spans k+1 slots) overwrites every stale
    position before it could come into range.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class SamplingParams:
    """Per-request sampling knobs (the serving analog of the reference's
    per-call GenerationArgs, generate.py:244).  Requires the engine to be
    constructed with ``per_request_sampling=True``.

    temperature <= 0 means greedy; top_k == 0 means no explicit top-k (the
    engine still bounds sampling to its static ``sampling_kmax`` subspace —
    default 64: a temperature-only or top-p-only request draws from the
    top-kmax logits, not the full vocab; raise the engine's
    ``sampling_kmax`` if you need high-temperature full-support draws);
    top_p == 0 disables nucleus filtering.  ``seed`` makes the request's
    random stream reproducible regardless of batch composition or
    preemption (draws are keyed by (seed, sequence position); any int is
    accepted and wrapped to uint32)."""

    temperature: float = 1.0
    top_k: int = 0
    top_p: float = 0.0
    seed: Optional[int] = None


@dataclasses.dataclass
class Request:
    rid: int
    prompt_ids: List[int]
    max_new_tokens: int
    output_ids: List[int] = dataclasses.field(default_factory=list)
    # tokens generated before a preemption (the continuation's prompt
    # includes them; the final answer is carried + output_ids)
    carried: List[int] = dataclasses.field(default_factory=list)
    sampling: Optional[SamplingParams] = None
    done: bool = False


class PageAllocator:
    """Free-list allocator over physical page ids [first_page, num_pages).

    Page 0 is conventionally reserved by the engine as the scratch page for
    inactive rows, so allocators start at 1 by default."""

    def __init__(self, num_pages: int, first_page: int = 1):
        self._free = list(range(num_pages - 1, first_page - 1, -1))
        self.capacity = num_pages - first_page
        self.high_water = 0

    @property
    def num_free(self) -> int:
        return len(self._free)

    @property
    def num_used(self) -> int:
        return self.capacity - len(self._free)

    def alloc(self, n: int) -> List[int]:
        if n > len(self._free):
            raise MemoryError(
                f"page pool exhausted: need {n}, free {len(self._free)}"
            )
        pages = [self._free.pop() for _ in range(n)]
        self.high_water = max(self.high_water, self.num_used)
        return pages

    def free(self, pages: List[int]) -> None:
        self._free.extend(pages)


class PrefixCache:
    """Content-addressed cache of immutable full KV pages.

    Pages are keyed by a CHAINED hash — page i's key covers tokens
    [0, (i+1)*page_size) — so a hit on page i implies the whole prefix
    matches, never just that one window.  Refcounted while mapped by
    active rows; refcount-0 pages park in an LRU (insertion-ordered dict)
    and return to the allocator only when :meth:`reclaim` is called under
    memory pressure."""

    def __init__(self):
        self._page_of: Dict[int, int] = {}  # key -> physical page
        self._refs: Dict[int, int] = {}  # key -> active refcount
        self._key_of: Dict[int, int] = {}  # physical page -> key
        self._lru: Dict[int, int] = {}  # key -> page, refcount == 0 only
        self.hit_tokens = 0
        self.query_tokens = 0

    @staticmethod
    def chain_keys(prompt_ids: List[int], page_size: int, n_pages: int):
        keys, h = [], 0
        for i in range(n_pages):
            h = hash((h, tuple(prompt_ids[i * page_size:(i + 1) * page_size])))
            keys.append(h)
        return keys

    def lookup(self, keys: List[int]) -> List[int]:
        """Longest cached prefix: physical pages for leading keys present."""
        pages = []
        for k in keys:
            page = self._page_of.get(k)
            if page is None:
                break
            pages.append(page)
        return pages

    def acquire(self, keys: List[int]) -> None:
        for k in keys:
            self._refs[k] = self._refs.get(k, 0) + 1
            self._lru.pop(k, None)

    def release(self, keys: List[int]) -> None:
        for k in keys:
            n = self._refs.get(k, 0) - 1
            if n > 0:
                self._refs[k] = n
            else:
                self._refs.pop(k, None)
                if k in self._page_of:
                    self._lru[k] = self._page_of[k]

    def insert(self, key: int, page: int) -> bool:
        """Register a page (the caller then holds one ref).  Returns False if
        the key is already mapped (first writer wins — the caller keeps its
        private copy and must NOT count the key among its refs)."""
        if key in self._page_of:
            return False
        self._page_of[key] = page
        self._key_of[page] = key
        self._refs[key] = self._refs.get(key, 0) + 1
        return True

    def owns(self, page: int) -> bool:
        return page in self._key_of

    def reclaim(self, n: int) -> List[int]:
        """Evict up to n LRU refcount-0 pages; returns the physical pages."""
        out = []
        for k in list(self._lru):
            if len(out) >= n:
                break
            page = self._lru.pop(k)
            self._page_of.pop(k, None)
            self._refs.pop(k, None)
            self._key_of.pop(page, None)
            out.append(page)
        return out

    @property
    def num_cached(self) -> int:
        return len(self._page_of)


class ServingEngine:
    """Continuous-batching paged-KV serving.

    Usage::

        eng = ServingEngine(model, params, max_batch=4, max_context=512)
        rid = eng.submit([1, 2, 3], max_new_tokens=32)
        outputs = eng.run()          # {rid: [token, ...]}

    Greedy by default; sampled mode via temperature/top_k/top_p.  With
    ``per_request_sampling=True`` each submit() may carry its own
    :class:`SamplingParams` (the per-call GenerationArgs the reference's
    ``generate_tokens(prompt, gen_args, tokenizer)`` signature implies,
    /root/reference/src/transformers/nlp/inference/generate.py:244) —
    rows with different temperatures/top-k/top-p share one jitted decode
    program, greedy rows stay bit-exact with their solo oracle, and seeded
    rows draw a (seed, position)-keyed stream independent of batchmates.
    Requests queue when all rows are busy or the page pool is full, and are
    admitted as rows/pages free up — the page pool may be sized well below
    max_batch * max_context (see ``total_pages``).
    """

    def __init__(
        self,
        model,
        params,
        *,
        max_batch: int,
        max_context: int,
        page_size: int = 128,
        total_pages: Optional[int] = None,
        kv_quant: Optional[str] = None,
        do_sample: bool = False,
        temperature: float = 1.0,
        top_k: Optional[int] = None,
        top_p: Optional[float] = None,
        approx_top_k: bool = False,
        eos_token_id: Optional[int] = None,
        pad_token_id: int = 0,
        prompt_buckets: Tuple[int, ...] = (32, 128, 512, 2048),
        seed: int = 0,
        prefix_caching: bool = False,
        decode_block_steps: int = 1,
        spec_k: int = 0,
        spec_ngram: int = 3,
        per_request_sampling: bool = False,
        sampling_kmax: int = 64,
        overlap_scheduling: bool = False,
    ):
        from vats_tpu.models.text_lm import resolve_dtype
        from vats_tpu.ops.decode_attention import PagedKVCache

        if kv_quant not in (None, "int8"):
            raise ValueError(f"unsupported kv_quant mode: {kv_quant!r}")
        cfg = model.cfg if hasattr(model, "cfg") else model.model.cfg
        self.model = model
        self.params = params
        self.cfg = cfg
        self.max_batch = max_batch
        self.max_context = min(max_context, cfg.max_seq_len)
        self.page_size = page_size
        self.pages_per_row = -(-self.max_context // page_size)
        self.eos_token_id = eos_token_id
        self.pad_token_id = pad_token_id
        self.prompt_buckets = tuple(
            b for b in sorted(prompt_buckets) if b <= self.max_context
        ) or (self.max_context,)
        self._sample_kw = dict(
            do_sample=do_sample, temperature=temperature, top_k=top_k,
            top_p=top_p, approx_top_k=approx_top_k,
        )
        self._rng = jax.random.PRNGKey(seed)
        self.per_request_sampling = per_request_sampling
        self.sampling_kmax = sampling_kmax
        self._seed0 = seed
        # engine-wide defaults expressed as per-row values (used for
        # requests submitted without SamplingParams)
        if not do_sample or (temperature is not None and temperature == 0):
            self._default_row_sampling = (0.0, 1, 0.0)
        else:
            self._default_row_sampling = (
                float(temperature if temperature is not None else 1.0),
                int(top_k or 0),
                float(top_p or 0.0),
            )

        # physical pool: page 0 is the scratch page inactive rows point at
        n_pages = total_pages if total_pages is not None else (
            max_batch * self.pages_per_row + 1
        )
        proto = PagedKVCache.create(
            num_layers=cfg.num_layers, batch_size=1,
            max_seq_len=n_pages * page_size, kv_heads=cfg.query_groups,
            head_dim=cfg.head_dim, page_size=page_size,
            dtype=jnp.int8 if kv_quant == "int8" else resolve_dtype(cfg.dtype),
        )
        self.pool = proto.kv_pages
        self.scales = proto.kv_scales  # None unless int8
        self.allocator = PageAllocator(n_pages)

        # host-side row state
        self.tables = np.zeros((max_batch, self.pages_per_row), np.int32)
        self.lengths = np.zeros((max_batch,), np.int32)
        self.last_tokens = np.zeros((max_batch,), np.int32)
        # per-row sampling state (per_request_sampling mode); inactive rows
        # sit at temperature 0 (greedy) which costs nothing
        self.row_temp = np.zeros((max_batch,), np.float32)
        self.row_topk = np.ones((max_batch,), np.int32)
        self.row_topp = np.zeros((max_batch,), np.float32)
        self.row_seed = np.zeros((max_batch,), np.uint32)
        self.row_request: List[Optional[Request]] = [None] * max_batch
        self.row_pages: List[List[int]] = [[] for _ in range(max_batch)]
        # automatic prefix caching: keys this row holds refs on (cache-owned
        # pages are excluded from allocator.free at retirement)
        self.prefix_cache = PrefixCache() if prefix_caching else None
        self.row_cached_keys: List[List[int]] = [[] for _ in range(max_batch)]
        self.queue: List[Request] = []
        self.preemptions = 0
        self._next_rid = 0
        if decode_block_steps < 1:
            raise ValueError("decode_block_steps must be >= 1")
        self.decode_block_steps = decode_block_steps
        if spec_k:
            if do_sample:
                raise ValueError(
                    "spec_k uses greedy acceptance; do_sample must be False"
                )
            if decode_block_steps > 1:
                raise ValueError("spec_k and decode_block_steps are exclusive")
            if per_request_sampling:
                raise ValueError(
                    "spec_k verification is greedy-only; per-request "
                    "sampling is not supported with speculative decoding"
                )
        if overlap_scheduling and spec_k:
            raise ValueError(
                "overlap_scheduling pipelines plain decode blocks; "
                "speculative decoding drives its own loop"
            )
        self.overlap_scheduling = overlap_scheduling
        #: the dispatched-but-unprocessed decode block (overlap mode):
        #: {'out': device [B, k], 'k': int, 'rows': [(row, req), ...]}
        self._inflight = None
        self.spec_k = spec_k
        self.spec_ngram = spec_ngram
        self.spec_proposed = 0
        self.spec_accepted = 0
        self._jit_prefill: Dict[int, Any] = {}
        self._jit_decode: Dict[int, Any] = {}
        self._jit_verify = None

    # ---------------- public API ----------------

    def submit(
        self,
        prompt_ids: List[int],
        max_new_tokens: int,
        sampling: Optional[SamplingParams] = None,
    ) -> int:
        if not prompt_ids:
            raise ValueError("empty prompt")
        if sampling is not None and not self.per_request_sampling:
            raise ValueError(
                "per-request SamplingParams require "
                "ServingEngine(per_request_sampling=True)"
            )
        if len(prompt_ids) >= self.max_context:
            raise ValueError(
                f"prompt ({len(prompt_ids)}) >= max_context "
                f"({self.max_context})"
            )
        worst_ctx = min(
            len(prompt_ids) + max_new_tokens + 1, self.max_context
        )
        if -(-worst_ctx // self.page_size) > self.allocator.capacity:
            raise ValueError(
                f"request footprint ({worst_ctx} tokens) exceeds the page "
                f"pool ({self.allocator.capacity} pages x {self.page_size})"
            )
        rid = self._next_rid
        self._next_rid += 1
        self.queue.append(
            Request(rid, list(prompt_ids), max_new_tokens, sampling=sampling)
        )
        return rid

    def run(self) -> Dict[int, List[int]]:
        """Drive until every submitted request completes; returns
        {rid: generated token ids}."""
        finished: Dict[int, List[int]] = {}
        while (self.queue or any(r is not None for r in self.row_request)
               or self._inflight is not None):
            for req in self.step():
                finished[req.rid] = req.output_ids
        return finished

    def step(self) -> List[Request]:
        """Admit what fits, run one decode step, retire finished rows.

        With ``overlap_scheduling`` the call is PIPELINED: it dispatches the
        next decode block (chained on the device to the previous block's
        final tokens) BEFORE fetching the previous block's results, so host
        scheduling — commits, EOS checks, retirement, admission prefill
        dispatch — and the host<->device round trip hide behind device
        compute.  Correctness leans on the device executing programs in
        dispatch order: any page freed/reallocated on the host is only
        WRITTEN by later-dispatched programs, which run after every program
        whose page table still references it."""
        self._admit()
        if self.spec_k or not self.overlap_scheduling:
            if not any(r is not None for r in self.row_request):
                return []
            if self.spec_k:
                self._spec_step()
            else:
                self._decode_step()
            return self._retire()

        new_block = None
        if any(r is not None and not r.done for r in self.row_request):
            new_block = self._dispatch_block(chained=self._inflight)
        retired: List[Request] = []
        if self._inflight is not None:
            self._process_block(self._inflight)
            retired = self._retire()
        self._inflight = new_block
        return retired

    # ---------------- internals ----------------

    def _bucket(self, n: int) -> int:
        for b in self.prompt_buckets:
            if n <= b:
                return b
        # beyond the largest bucket (e.g. a preempted continuation's long
        # prompt): round up to the 128-lane tile, capped at max_context
        return min(-(-n // 128) * 128, self.max_context)

    #: rows prefilled per program call (batched admission); group sizes are
    #: padded to powers of two so at most log2(this)+1 programs compile per
    #: prompt bucket.  A burst of admissions costs ceil(R/16) host
    #: round-trips instead of R.
    MAX_PREFILL_GROUP = 16

    def _admit(self) -> None:
        ready: List[Tuple[int, Request, int, List[int]]] = []
        for row in range(self.max_batch):
            if not self.queue or self.row_request[row] is not None:
                continue
            req = self.queue[0]
            plen = len(req.prompt_ids)
            total_slots = -(-(plen + 1) // self.page_size)  # + first decode
            keys: List[int] = []
            cached_pages: List[int] = []
            if self.prefix_cache is not None:
                keys = PrefixCache.chain_keys(
                    req.prompt_ids, self.page_size, plen // self.page_size
                )
                # cap the hit below the whole prompt: the LAST prompt token
                # must be recomputed so its logits seed the first decode
                usable = (plen - 1) // self.page_size
                cached_pages = self.prefix_cache.lookup(keys)[:usable]
            cached_slots = len(cached_pages)
            cached_keys = keys[:cached_slots]
            # Pin the matched pages BEFORE any reclaim: refcount-0 prefix
            # pages park in the LRU, and _reclaim below could otherwise
            # evict exactly the pages this lookup returned — the row would
            # then map stale physical ids (page aliasing / double-free
            # under memory pressure).
            if cached_keys:
                self.prefix_cache.acquire(cached_keys)
            need = total_slots - cached_slots
            if need > self.allocator.num_free:
                self._reclaim(need - self.allocator.num_free)
            if need > self.allocator.num_free:
                if cached_keys:
                    self.prefix_cache.release(cached_keys)
                break  # head-of-line waits for pages to free
            self.queue.pop(0)
            if self.prefix_cache is not None:
                # stats count ADMITTED prompts only — a head-of-line request
                # waiting for pages must not re-count its query/hit tokens
                # on every retry
                self.prefix_cache.query_tokens += plen
                self.prefix_cache.hit_tokens += (
                    cached_slots * self.page_size
                )
            pages = cached_pages + self.allocator.alloc(need)
            self.row_pages[row] = pages
            self.tables[row, :] = 0
            self.tables[row, : len(pages)] = pages
            self.row_cached_keys[row] = list(cached_keys)
            self.row_request[row] = req
            sp = req.sampling or SamplingParams(*self._default_row_sampling)
            self.row_temp[row] = sp.temperature
            self.row_topk[row] = sp.top_k
            self.row_topp[row] = sp.top_p
            # mask explicitly: NumPy >= 2.0 raises OverflowError on
            # np.uint32(negative or >= 2**32) instead of wrapping
            self.row_seed[row] = np.uint32(
                (sp.seed if sp.seed is not None else (self._seed0 + req.rid))
                & 0xFFFFFFFF
            )
            ready.append((row, req, cached_slots * self.page_size, keys))

        # batched admission: group the ready rows by tail bucket and prefill
        # each group in ONE program call
        groups: Dict[int, List[Tuple[int, Request, int, List[int]]]] = {}
        for item in ready:
            row, req, cached_len, _ = item
            bucket = self._bucket(len(req.prompt_ids) - cached_len)
            groups.setdefault(bucket, []).append(item)
        for bucket, items in groups.items():
            for i in range(0, len(items), self.MAX_PREFILL_GROUP):
                self._prefill_group(bucket, items[i:i + self.MAX_PREFILL_GROUP])

    def _prefill_group(
        self,
        bucket: int,
        items: List[Tuple[int, Request, int, List[int]]],
    ) -> None:
        """Prefill up to MAX_PREFILL_GROUP admitted rows in ONE program.

        Each row's UNCACHED prompt tail runs at its own sequence offset
        (``cached_len``, page-aligned; 0 without a prefix-cache hit) — the
        paged attention path computes positions and causal masks from the
        per-row cache ``lengths``, so a batched tail prefill needs no more
        than a lengths vector.  The group is padded to the next power of
        two with scratch rows (token 0 against the scratch page) so at most
        log2(MAX_PREFILL_GROUP)+1 programs exist per bucket."""
        r = len(items)
        rpad = 1
        while rpad < r:
            rpad *= 2
        ids = np.zeros((rpad, bucket), np.int32)
        mask = np.zeros((rpad, bucket), bool)
        mask[:, 0] = True  # padding rows: one token, committed to scratch
        tables = np.zeros((rpad, self.pages_per_row), np.int32)
        starts = np.zeros((rpad,), np.int32)
        last_idx = np.zeros((rpad,), np.int32)
        for g, (row, req, cached_len, _) in enumerate(items):
            tail = req.prompt_ids[cached_len:]
            ids[g, : len(tail)] = tail
            mask[g, : len(tail)] = True
            tables[g] = self.tables[row]
            starts[g] = cached_len
            last_idx[g] = len(tail) - 1

        key = (bucket, rpad)
        if key not in self._jit_prefill:
            engine = self

            def prefill_fn(
                params, pool, scales, table, ids, mask, last_idx, start
            ):
                from vats_tpu.ops.decode_attention import PagedKVCache

                cache = PagedKVCache(
                    kv_pages=pool, page_table=table, lengths=start,
                    kv_scales=scales, head_dim=engine.cfg.head_dim,
                )
                logits, cache, _ = engine.model.apply(
                    params, ids, padding_mask=mask, paged_cache=cache,
                    deterministic=True, readout_positions=last_idx,
                )
                return logits[:, 0], cache.kv_pages, cache.kv_scales

            self._jit_prefill[key] = jax.jit(
                prefill_fn, donate_argnums=(1, 2)
            )

        logits, self.pool, self.scales = self._jit_prefill[key](
            self.params, self.pool, self.scales,
            jnp.asarray(tables), jnp.asarray(ids), jnp.asarray(mask),
            jnp.asarray(last_idx), jnp.asarray(starts),
        )
        if self.per_request_sampling:
            from vats_tpu.inference.sampling import sample_logits_per_row

            g_temp = np.zeros((rpad,), np.float32)
            g_topk = np.ones((rpad,), np.int32)
            g_topp = np.zeros((rpad,), np.float32)
            g_seed = np.zeros((rpad,), np.uint32)
            g_pos = np.zeros((rpad,), np.int32)
            for g, (row, req, cached_len, _) in enumerate(items):
                g_temp[g] = self.row_temp[row]
                g_topk[g] = self.row_topk[row]
                g_topp[g] = self.row_topp[row]
                g_seed[g] = self.row_seed[row]
                g_pos[g] = len(req.prompt_ids)
            toks = np.asarray(jax.device_get(sample_logits_per_row(
                None, logits, temperature=jnp.asarray(g_temp),
                top_k=jnp.asarray(g_topk), top_p=jnp.asarray(g_topp),
                row_seeds=jnp.asarray(g_seed), positions=jnp.asarray(g_pos),
                kmax=self.sampling_kmax,
            )))
        else:
            self._rng, srng = jax.random.split(self._rng)
            toks = np.asarray(jax.device_get(self._sample(srng, logits)))
        for g, (row, req, cached_len, keys) in enumerate(items):
            plen = len(req.prompt_ids)
            tok = int(toks[g])
            self.lengths[row] = plen
            self.last_tokens[row] = tok
            req.output_ids.append(tok)
            if self.prefix_cache is not None:
                # register the newly-written FULL prompt pages (immutable
                # from here on: decode writes at positions >= plen)
                for i in range(
                    cached_len // self.page_size, plen // self.page_size
                ):
                    if self.prefix_cache.insert(
                        keys[i], self.row_pages[row][i]
                    ):
                        self.row_cached_keys[row].append(keys[i])
            self._maybe_finish(row, req, tok)

    def _sample(self, rng, logits):
        from vats_tpu.inference.sampling import sample_logits

        return sample_logits(rng, logits, **self._sample_kw)

    def _ensure_pages(self, lookahead: int = 1, lengths=None) -> None:
        """Every active row needs pages mapped for the next ``lookahead``
        positions before the decode block commits there.  When the pool is
        exhausted mid-flight, the youngest row is PREEMPTED — requeued as a
        continuation whose prompt is (original prompt + tokens so far) — and
        its pages freed, vLLM-style (with greedy decoding the continuation
        reproduces the un-preempted tokens exactly; sampled mode resumes a
        valid stream).  ``lengths`` overrides self.lengths (overlap mode
        passes lengths advanced by the still-in-flight block)."""
        if lengths is None:
            lengths = self.lengths
        for row, req in enumerate(self.row_request):
            if req is None or req.done:
                continue
            slot = (int(lengths[row]) + lookahead - 1) // self.page_size
            while slot >= len(self.row_pages[row]):
                if self.allocator.num_free == 0:
                    self._reclaim(1)  # evict idle cached pages before anyone
                if self.allocator.num_free > 0:
                    page = self.allocator.alloc(1)[0]
                    self.row_pages[row].append(page)
                    # map the slot actually being filled — when the loop
                    # allocates 2+ pages (lookahead > page_size) each new
                    # page gets its own table entry, not the final slot
                    self.tables[row, len(self.row_pages[row]) - 1] = page
                    continue
                victim = self._pick_victim(exclude=row)
                if victim is None:
                    # only this row holds pages: impossible by the submit
                    # capacity guard, but fail loudly rather than spin
                    raise MemoryError("page pool exhausted with no victim")
                self._preempt(victim)

    def _pick_victim(self, exclude: int) -> Optional[int]:
        """Youngest active row (fewest generated tokens) other than
        ``exclude`` — it has the least work to replay."""
        best, best_out = None, None
        for row, req in enumerate(self.row_request):
            if req is None or row == exclude:
                continue
            n = len(req.output_ids)
            if best is None or n < best_out:
                best, best_out = row, n
        return best

    def _reclaim(self, n: int) -> None:
        """Return up to ``n`` idle (refcount-0) prefix-cache pages to the
        allocator — called only under memory pressure."""
        if self.prefix_cache is not None and n > 0:
            pages = self.prefix_cache.reclaim(n)
            if pages:
                self.allocator.free(pages)

    def _free_row(self, row: int) -> None:
        """Release a row's pages: refs on shared prefix pages are dropped
        (they park in the cache's LRU, still resident), private pages go
        back to the allocator."""
        pc = self.prefix_cache
        if pc is not None and self.row_cached_keys[row]:
            pc.release(self.row_cached_keys[row])
            self.row_cached_keys[row] = []
        self.allocator.free(
            [p for p in self.row_pages[row]
             if pc is None or not pc.owns(p)]
        )
        self.row_pages[row] = []
        self.tables[row, :] = 0
        self.lengths[row] = 0
        self.last_tokens[row] = 0
        self.row_temp[row] = 0.0
        self.row_topk[row] = 1
        self.row_topp[row] = 0.0
        self.row_seed[row] = 0
        self.row_request[row] = None

    def _preempt(self, row: int) -> None:
        self.preemptions += 1
        req = self.row_request[row]
        cont = Request(
            rid=req.rid,
            prompt_ids=req.prompt_ids + req.output_ids,
            max_new_tokens=req.max_new_tokens - len(req.output_ids),
            carried=req.carried + req.output_ids,
            # position-keyed draws make the resumed stream identical to the
            # un-preempted one (greedy or sampled)
            sampling=req.sampling,
        )
        self.queue.insert(0, cont)
        self._free_row(row)

    def _decode_fn(self, k: int):
        """One jitted program running ``k`` decode steps (k static; compiled
        once per distinct k — in practice {1, decode_block_steps})."""
        if k not in self._jit_decode:
            engine = self

            def decode_fn(
                params, pool, scales, tables, lengths, tokens, rng,
                temps, topks, topps, seeds,
            ):
                from vats_tpu.ops.decode_attention import PagedKVCache

                cache = PagedKVCache(
                    kv_pages=pool, page_table=tables, lengths=lengths,
                    kv_scales=scales, head_dim=engine.cfg.head_dim,
                )
                out0 = jnp.zeros((tokens.shape[0], k), jnp.int32)

                def body(i, carry):
                    cache, toks, out = carry
                    logits, cache, _ = engine.model.apply(
                        params, toks[:, None], paged_cache=cache,
                        deterministic=True,
                    )
                    if engine.per_request_sampling:
                        from vats_tpu.inference.sampling import (
                            sample_logits_per_row,
                        )

                        # cache.lengths (post-advance) is the sequence
                        # position the sampled token will occupy — the
                        # (seed, position) key makes each request's stream
                        # independent of its batchmates
                        nxt = sample_logits_per_row(
                            None, logits[:, 0], temperature=temps,
                            top_k=topks, top_p=topps, row_seeds=seeds,
                            positions=cache.lengths,
                            kmax=engine.sampling_kmax,
                        )
                    else:
                        nxt = engine._sample(
                            jax.random.fold_in(rng, i), logits[:, 0]
                        )
                    return cache, nxt, out.at[:, i].set(nxt)

                cache, _, out = jax.lax.fori_loop(
                    0, k, body, (cache, tokens, out0)
                )
                return out, cache.kv_pages, cache.kv_scales

            self._jit_decode[k] = jax.jit(decode_fn, donate_argnums=(1, 2))
        return self._jit_decode[k]

    def _dispatch_block(self, chained=None):
        """Dispatch one k-step decode block; returns it unfetched.

        ``chained`` is the still-in-flight previous block: lengths are
        advanced optimistically by its k for the rows it decodes (their
        device-side cache.lengths advance exactly so), and the input tokens
        come from ITS device-resident final column — no host round trip on
        the critical path.  Returns None to stall the pipeline when a
        chained block cannot safely run (context margin thinner than k)."""
        k = self.decode_block_steps
        lengths = self.lengths.copy()
        chain_mask = np.zeros((self.max_batch,), bool)
        if chained is not None:
            for row, req in chained["rows"]:
                if self.row_request[row] is req:
                    lengths[row] += chained["k"]
                    chain_mask[row] = True
        margin = min(
            (self.max_context - 1 - int(lengths[row])
             for row, req in enumerate(self.row_request)
             if req is not None and not req.done),
            default=k,
        )
        if margin < k:
            if chained is not None:
                return None  # drain first; the sequential fallback handles it
            k = 1
        self._ensure_pages(lookahead=k, lengths=lengths)
        self._rng, srng = jax.random.split(self._rng)
        if chained is None:
            tokens = jnp.asarray(self.last_tokens, jnp.int32)
        else:
            tokens = jnp.where(
                jnp.asarray(chain_mask),
                chained["out"][:, -1],
                jnp.asarray(self.last_tokens, jnp.int32),
            )
        out, self.pool, self.scales = self._decode_fn(k)(
            self.params, self.pool, self.scales,
            jnp.asarray(self.tables, jnp.int32),
            jnp.asarray(lengths, jnp.int32),
            tokens,
            srng,
            jnp.asarray(self.row_temp), jnp.asarray(self.row_topk),
            jnp.asarray(self.row_topp), jnp.asarray(self.row_seed),
        )
        return {
            "out": out,
            "k": k,
            "rows": [
                (row, req) for row, req in enumerate(self.row_request)
                if req is not None and not req.done
            ],
        }

    def _process_block(self, block) -> None:
        """Fetch a dispatched block's tokens and commit them to the rows it
        decoded.  Commits key on request IDENTITY: a row retired/preempted/
        re-admitted since the block's dispatch silently drops its (garbage)
        lane."""
        out = np.asarray(jax.device_get(block["out"]))  # [B, k]
        for row, req in block["rows"]:
            if self.row_request[row] is not req or req.done:
                continue
            for j in range(block["k"]):
                # each accepted token was committed at position lengths[row];
                # tokens past EOS/budget stay uncounted (never attended, and
                # overwritten in place by this row's next real commits)
                self.lengths[row] += 1
                tok = int(out[row, j])
                self.last_tokens[row] = tok
                req.output_ids.append(tok)
                self._maybe_finish(row, req, tok)
                if req.done:
                    break

    def _decode_step(self) -> None:
        self._process_block(self._dispatch_block())

    def _draft(self, context: List[int]) -> List[int]:
        """Prompt-lookup draft: match the tail n-gram (n = spec_ngram down
        to 1) against the row's own history and propose the k tokens that
        followed the latest earlier occurrence.  No draft model, no extra
        device work — repetitive text (code, quotes, structured output)
        accepts most drafts; random text rejects them and costs one wasted
        window."""
        k = self.spec_k
        for n in range(min(self.spec_ngram, len(context) - 1), 0, -1):
            tail = context[-n:]
            for i in range(len(context) - n - 1, -1, -1):
                if context[i:i + n] == tail:
                    # i + n <= len - 1, so at least one token follows
                    cont = context[i + n:i + n + k]
                    return (cont + [cont[-1]] * k)[:k]
        return [context[-1]] * k

    def _spec_step(self) -> None:
        kp1 = self.spec_k + 1
        margin = min(
            (self.max_context - 1 - int(self.lengths[row])
             for row, req in enumerate(self.row_request)
             if req is not None and not req.done),
            default=0,
        )
        if margin < kp1:
            self._decode_step()  # single-step; spec forbids block > 1
            return
        self._ensure_pages(lookahead=kp1)
        drafts = np.zeros((self.max_batch, kp1), np.int32)
        drafts[:, 0] = self.last_tokens
        for row, req in enumerate(self.row_request):
            if req is None or req.done:
                continue
            drafts[row, 1:] = self._draft(req.prompt_ids + req.output_ids)
            self.spec_proposed += self.spec_k

        if self._jit_verify is None:
            engine = self

            def verify_fn(params, pool, scales, tables, lengths, tokens):
                from vats_tpu.ops.decode_attention import PagedKVCache

                cache = PagedKVCache(
                    kv_pages=pool, page_table=tables, lengths=lengths,
                    kv_scales=scales, head_dim=engine.cfg.head_dim,
                )
                logits, cache, _ = engine.model.apply(
                    params, tokens,
                    padding_mask=jnp.ones_like(tokens, dtype=bool),
                    paged_cache=cache, deterministic=True,
                )
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return nxt, cache.kv_pages, cache.kv_scales

            self._jit_verify = jax.jit(verify_fn, donate_argnums=(1, 2))

        nxt, self.pool, self.scales = self._jit_verify(
            self.params, self.pool, self.scales,
            jnp.asarray(self.tables, jnp.int32),
            jnp.asarray(self.lengths, jnp.int32),
            jnp.asarray(drafts),
        )
        nxt = np.asarray(jax.device_get(nxt))  # [B, k+1] greedy tokens
        for row, req in enumerate(self.row_request):
            if req is None or req.done:
                continue
            for j in range(kp1):
                # iteration j accounts the commit of drafts[row, j] (an
                # already-accepted token) and reads the model's prediction
                # for the next position; on a draft match the prediction IS
                # the next committed input, so the window stays valid
                self.lengths[row] += 1
                tok = int(nxt[row, j])
                self.last_tokens[row] = tok
                req.output_ids.append(tok)
                self._maybe_finish(row, req, tok)
                if req.done:
                    break
                if j < self.spec_k and tok == int(drafts[row, j + 1]):
                    self.spec_accepted += 1
                    continue
                break  # first correction ends this row's window

    def _maybe_finish(self, row: int, req: Request, tok: int) -> None:
        hit_eos = self.eos_token_id is not None and tok == self.eos_token_id
        # the final sampled token is reported but never committed to KV
        if hit_eos or len(req.output_ids) >= req.max_new_tokens or (
            int(self.lengths[row]) + 1 >= self.max_context
        ):
            req.done = True

    def _retire(self) -> List[Request]:
        out = []
        for row, req in enumerate(self.row_request):
            if req is not None and req.done:
                if req.carried:
                    req.output_ids = req.carried + req.output_ids
                    req.carried = []
                out.append(req)
                self._free_row(row)
        return out
