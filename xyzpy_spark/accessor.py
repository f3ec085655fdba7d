"""The ``xyz`` helper namespace over result DataFrames.

Reference: the ``.xyz`` xarray accessor (``xyzpy/__init__.py:212-282``)
registers the engine's reductions directly on every Dataset.  Spark
DataFrames cannot be monkey-patched safely, so the same ergonomics
come from a thin wrapper: ``xyz(df).aggregate_over(...).histogram(...)``
— every method returns a new wrapper around a lazy plan, terminal
``.df`` unwraps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class xyz:  # noqa: N801 — mirrors the reference accessor name
    """Chainable operator namespace over a long-format DataFrame."""

    def __init__(self, df: DataFrame):
        self.df = df

    def _wrap(self, df: DataFrame) -> "xyz":
        return xyz(df)

    # -- reductions ------------------------------------------------------
    def aggregate_over(self, keep_dims, var_names, **kw) -> "xyz":
        from .operators.reductions import aggregate_over

        return self._wrap(aggregate_over(self.df, keep_dims, var_names, **kw))

    def histogram(self, x, **kw) -> "xyz":
        from .operators.reductions import histogram

        return self._wrap(histogram(self.df, x, **kw))

    def heatmap(self, x, y, z, **kw) -> "xyz":
        from .operators.reductions import heatmap_table

        return self._wrap(heatmap_table(self.df, x, y, z, **kw))

    def fuse_dims(self, dims, name, **kw) -> "xyz":
        from .operators.reductions import fuse_dims

        return self._wrap(fuse_dims(self.df, dims, name, **kw))

    def trimna(self, dims, var_names, **kw) -> "xyz":
        from .operators.reductions import trimna

        return self._wrap(trimna(self.df, dims, var_names, **kw))

    def post_fix(self, postfix, var_names=None) -> "xyz":
        from .operators.reductions import post_fix

        return self._wrap(post_fix(self.df, postfix, var_names))

    def check_runs(self, dim, var_names=()) -> "xyz":
        from .operators.reductions import check_runs

        return self._wrap(check_runs(self.df, dim, var_names))

    # -- missing/merge ---------------------------------------------------
    def find_missing_cases(self, dims, var_names, **kw) -> "xyz":
        from .missing import find_missing_cases

        return self._wrap(find_missing_cases(self.df, dims, var_names, **kw))

    def union_grid(self, dims, var_names) -> "xyz":
        from .missing import union_grid_view

        return self._wrap(union_grid_view(self.df, dims, var_names))

    def merge(self, other, dims, **kw) -> "xyz":
        from .merge import merge_datasets

        other = other.df if isinstance(other, xyz) else other
        return self._wrap(merge_datasets(self.df, other, dims, **kw))

    # -- stats -----------------------------------------------------------
    def running_stats(self, var, by=()) -> "xyz":
        from .functions.stats import running_stats

        return self._wrap(running_stats(self.df, var, by))

    # -- presentation ----------------------------------------------------
    def to_dense_pandas(self, dims, var_names=None):
        from .runner import to_dense_pandas

        return to_dense_pandas(self.df, dims, var_names)

    def facets(self, row_dim=None, col_dim=None):
        from .operators.facet import facet_data

        for rv, cv, sub in facet_data(self.df, row_dim, col_dim):
            yield rv, cv, xyz(sub)

    def xy_points(self, x, y, **kw) -> "xyz":
        from .operators.facet import xy_points

        return self._wrap(xy_points(self.df, x, y, **kw))

    # -- corpus pipeline (beyond-reference extensions) -------------------
    def quality(self, text_col: str = "text") -> "xyz":
        from .pipeline.text import add_quality

        return self._wrap(add_quality(self.df, text_col))

    def repetition(self, text_col: str = "text") -> "xyz":
        from .pipeline.text import add_repetition

        return self._wrap(add_repetition(self.df, text_col))

    def token_count(self, text_col: str = "text") -> "xyz":
        from .pipeline.text import add_token_count

        return self._wrap(add_token_count(self.df, text_col))

    def language_id(self, text_col: str = "text") -> "xyz":
        from .pipeline.text import add_language_id

        return self._wrap(add_language_id(self.df, text_col))

    def fingerprint(self, text_col: str = "text") -> "xyz":
        from .pipeline.text import add_fingerprint

        return self._wrap(add_fingerprint(self.df, text_col))

    def filter_corpus(self, **kw) -> "xyz":
        from .pipeline.text import filter_corpus

        return self._wrap(filter_corpus(self.df, **kw))

    def dedup_exact(self, **kw) -> "xyz":
        from .pipeline.dedup import dedup_exact

        return self._wrap(dedup_exact(self.df, **kw))

    def dedup_corpus(self, **kw) -> "xyz":
        from .pipeline.dedup import dedup_corpus

        return self._wrap(dedup_corpus(self.df, **kw))

    def quality_trained(self, weights, intercept=0.0, **kw) -> "xyz":
        from .pipeline.text import score_quality_trained

        return self._wrap(
            score_quality_trained(self.df, weights, intercept, **kw)
        )

    def quality_model(self, text_col: str = "text", **kw) -> "xyz":
        from .pipeline.text import score_quality_model

        return self._wrap(score_quality_model(self.df, text_col, **kw))

    def semantic_dedup(self, **kw) -> "xyz":
        from .pipeline.dedup import semantic_dedup

        return self._wrap(semantic_dedup(self.df, **kw))

    def sample_token_budget(self, budgets, **kw) -> "xyz":
        from .pipeline.sampling import sample_token_budget

        return self._wrap(sample_token_budget(self.df, budgets, **kw))

    def hash_sample(self, key, fraction, **kw) -> "xyz":
        from .pipeline.sampling import hash_sample

        return self._wrap(hash_sample(self.df, key, fraction, **kw))

    def scrub_pii(self, **kw) -> "xyz":
        from .pipeline.text import scrub_pii

        return self._wrap(scrub_pii(self.df, **kw))

    def decontaminate(self, eval_df, **kw) -> "xyz":
        from .pipeline.text import decontaminate

        eval_df = eval_df.df if isinstance(eval_df, xyz) else eval_df
        return self._wrap(decontaminate(self.df, eval_df, **kw))

    def dedup_paragraphs(self, **kw) -> "xyz":
        from .pipeline.dedup import dedup_paragraphs

        return self._wrap(dedup_paragraphs(self.df, **kw))

    def dedup_substrings(self, k: int = 5, **kw) -> "xyz":
        from .pipeline.dedup import duplicate_substring_spans

        return self._wrap(duplicate_substring_spans(self.df, k, **kw))

    def strip_substrings(self, k: int = 5, **kw) -> "xyz":
        from .pipeline.dedup import strip_duplicate_spans

        return self._wrap(strip_duplicate_spans(self.df, k, **kw))

    def resize_image(self, width: int, height: int, **kw) -> "xyz":
        from .pipeline.multimodal import resize_image

        return self._wrap(resize_image(self.df, width, height, **kw))

    def image_features(self, **kw) -> "xyz":
        from .pipeline.multimodal import image_features

        return self._wrap(image_features(self.df, **kw))

    def audio_features(self, **kw) -> "xyz":
        from .pipeline.multimodal import audio_features

        return self._wrap(audio_features(self.df, **kw))

    def resample_audio(self, target_rate: int, **kw) -> "xyz":
        from .pipeline.multimodal import resample_audio

        return self._wrap(resample_audio(self.df, target_rate, **kw))

    def lm_score(self, unigrams, bigrams, vocab_size: int, **kw) -> "xyz":
        from .pipeline.lm import score_bigram_nll

        return self._wrap(
            score_bigram_nll(self.df, unigrams, bigrams, vocab_size, **kw)
        )

    def ccnet_buckets(self, unigrams, bigrams, vocab_size: int, **kw) -> "xyz":
        from .pipeline.lm import ccnet_buckets

        return self._wrap(
            ccnet_buckets(self.df, unigrams, bigrams, vocab_size, **kw)
        )

    def bloom_contamination(self, eval_df, **kw) -> "xyz":
        from .pipeline.text import bloom_contamination_hits

        eval_df = eval_df.df if isinstance(eval_df, xyz) else eval_df
        return self._wrap(bloom_contamination_hits(self.df, eval_df, **kw))

    def contamination_pairs(self, eval_df, **kw) -> "xyz":
        from .pipeline.text import contamination_pairs

        eval_df = eval_df.df if isinstance(eval_df, xyz) else eval_df
        return self._wrap(contamination_pairs(self.df, eval_df, **kw))

    def project_embeddings(self, out_dim: int, **kw) -> "xyz":
        from .pipeline.similarity import project_embeddings

        return self._wrap(project_embeddings(self.df, out_dim, **kw))

    def corpus_stats(self, by=("source", "lang"), **kw) -> "xyz":
        from .pipeline.text import corpus_stats

        return self._wrap(corpus_stats(self.df, by, **kw))

    def keyword_hits(self, keywords, **kw) -> "xyz":
        from .pipeline.text import keyword_hits

        return self._wrap(keyword_hits(self.df, keywords, **kw))

    def filter_blocklist(self, keywords, **kw) -> "xyz":
        from .pipeline.text import filter_blocklist

        return self._wrap(filter_blocklist(self.df, keywords, **kw))

    def profile(self, cols=None, **kw) -> "xyz":
        from .functions.profile import profile_table

        return self._wrap(profile_table(self.df, cols, **kw))

    def normalize_text(self, **kw) -> "xyz":
        from .pipeline.text import normalize_text

        return self._wrap(normalize_text(self.df, **kw))

    def quantize_embeddings(self, **kw) -> "xyz":
        from .pipeline.similarity import quantize_embeddings

        return self._wrap(quantize_embeddings(self.df, **kw))

    def bpe_encode(self, merges, **kw) -> "xyz":
        from .pipeline.tokenizer import bpe_encode

        return self._wrap(bpe_encode(self.df, merges, **kw))

    def tokenized_sequences(self, merges, **kw):
        from .pipeline.tokenizer import tokenized_sequences

        seqs, vocab = tokenized_sequences(self.df, merges, **kw)
        return self._wrap(seqs), vocab

    def oov_rate(self, merges, vocab, **kw) -> "xyz":
        from .pipeline.tokenizer import oov_rate

        return self._wrap(oov_rate(self.df, merges, vocab, **kw))

    def strip_duplicate_lines(self, **kw) -> "xyz":
        from .pipeline.dedup import strip_duplicate_lines

        return self._wrap(strip_duplicate_lines(self.df, **kw))

    def dedup_against(self, reference_df, **kw) -> "xyz":
        from .pipeline.dedup import dedup_against

        reference_df = (
            reference_df.df
            if isinstance(reference_df, xyz)
            else reference_df
        )
        return self._wrap(dedup_against(self.df, reference_df, **kw))

    def strip_html(self, **kw) -> "xyz":
        from .pipeline.text import strip_html

        return self._wrap(strip_html(self.df, **kw))

    def mixture_weights(self, stratum: str = "source", **kw) -> "xyz":
        from .pipeline.sampling import temperature_mixture_weights

        return self._wrap(
            temperature_mixture_weights(self.df, stratum, **kw)
        )

    def vocab_coverage(self, **kw) -> "xyz":
        from .pipeline.sampling import vocab_coverage

        return self._wrap(vocab_coverage(self.df, **kw))

    def chunk_documents(self, **kw) -> "xyz":
        from .pipeline.text import chunk_documents

        return self._wrap(chunk_documents(self.df, **kw))

    def gopher_rules(self, **kw) -> "xyz":
        from .pipeline.text import add_gopher_rules

        return self._wrap(add_gopher_rules(self.df, **kw))

    def gopher_filter(self, **kw) -> "xyz":
        from .pipeline.text import gopher_filter

        return self._wrap(gopher_filter(self.df, **kw))

    def packing_stats(self, **kw) -> "xyz":
        from .pipeline.packing import packing_stats

        return self._wrap(packing_stats(self.df, **kw))

    def dsir_weights(self, target_df, **kw) -> "xyz":
        from .pipeline.dsir import dsir_weights

        target_df = (
            target_df.df if isinstance(target_df, xyz) else target_df
        )
        return self._wrap(dsir_weights(self.df, target_df, **kw))

    def dsir_select(self, target_df, k: int, **kw) -> "xyz":
        from .pipeline.dsir import dsir_select

        target_df = (
            target_df.df if isinstance(target_df, xyz) else target_df
        )
        return self._wrap(dsir_select(self.df, target_df, k, **kw))

    def curate(self, reference_df=None, eval_df=None, **kw):
        from .pipeline.curate import curate_corpus

        reference_df = (
            reference_df.df if isinstance(reference_df, xyz) else reference_df
        )
        eval_df = eval_df.df if isinstance(eval_df, xyz) else eval_df
        out = curate_corpus(
            self.df, reference_df=reference_df, eval_df=eval_df, **kw
        )
        if kw.get("report"):
            df, stages = out  # report mode returns (df, stage counts)
            return self._wrap(df), stages
        return self._wrap(out)

    def winnow_fingerprints(self, **kw) -> "xyz":
        from .pipeline.dedup import winnow_fingerprints

        return self._wrap(winnow_fingerprints(self.df, **kw))

    def cdc_chunks(self, **kw) -> "xyz":
        from .pipeline.dedup import cdc_chunks

        return self._wrap(cdc_chunks(self.df, **kw))

    def pmi_collocations(self, **kw) -> "xyz":
        from .pipeline.ir import pmi_collocations

        return self._wrap(pmi_collocations(self.df, **kw))

    def tfidf_top_terms(self, **kw) -> "xyz":
        from .pipeline.ir import tfidf_top_terms

        return self._wrap(tfidf_top_terms(self.df, **kw))

    def bm25_search(self, query, **kw) -> "xyz":
        from .pipeline.ir import bm25_search

        return self._wrap(bm25_search(self.df, query, **kw))

    def cap_per_group(self, max_rows: int, **kw) -> "xyz":
        from .pipeline.sampling import cap_per_group

        return self._wrap(cap_per_group(self.df, max_rows, **kw))

    def weighted_sample(self, k: int, weight_col: str, **kw) -> "xyz":
        from .pipeline.sampling import weighted_sample

        return self._wrap(weighted_sample(self.df, k, weight_col, **kw))

    def hll_distinct(self, col: str, by=(), **kw) -> "xyz":
        from .functions.sketch import hll_distinct

        return self._wrap(hll_distinct(self.df, col, by, **kw))

    def funnel(self, steps, *, sequential: bool = False, **kw) -> "xyz":
        from .operators.temporal import (
            funnel_counts,
            funnel_counts_sequential,
        )

        fn = funnel_counts_sequential if sequential else funnel_counts
        return self._wrap(fn(self.df, steps, **kw))

    def cohort_retention(self, **kw) -> "xyz":
        from .operators.temporal import cohort_retention

        return self._wrap(cohort_retention(self.df, **kw))

    def divergence_from(self, other, **kw) -> "xyz":
        """Token-distribution JS drift of ``other`` relative to this
        corpus (this DataFrame is the reference side a)."""
        from .pipeline.drift import corpus_divergence

        other = other.df if isinstance(other, xyz) else other
        return self._wrap(corpus_divergence(self.df, other, **kw))

    def value_divergence_from(self, other, col, *, lo, hi, **kw) -> "xyz":
        """Fixed-bin numeric-distribution JS drift of ``other`` vs
        this snapshot's ``col`` values."""
        from .pipeline.drift import numeric_divergence

        other = other.df if isinstance(other, xyz) else other
        return self._wrap(
            numeric_divergence(self.df, other, col, lo=lo, hi=hi, **kw)
        )

    def multi_divergence_from(self, other, specs, **kw) -> "xyz":
        """Multi-column fixed-bin JS drift of ``other`` vs this
        snapshot — k monitored columns in ONE scan per side
        (``specs`` maps column -> (lo, hi); r11)."""
        from .pipeline.drift import numeric_divergence_multi

        other = other.df if isinstance(other, xyz) else other
        return self._wrap(
            numeric_divergence_multi(self.df, other, specs, **kw)
        )

    # -- presentation (dense) -------------------------------------------
    def to_xarray(self, dims, **kw):
        from .runner import to_xarray

        return to_xarray(self.df, dims, **kw)

    # -- passthrough -----------------------------------------------------
    def __getattr__(self, name):
        attr = getattr(self.df, name)
        if callable(attr):
            def passthrough(*args, **kwargs):
                out = attr(*args, **kwargs)
                return self._wrap(out) if isinstance(out, DataFrame) else out

            return passthrough
        return attr
