"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing here
(or in the library) calls ray.init()/ray.shutdown().

``queries()`` maps one entry per implemented pipeline (SURVEY.md §2) to a
callable(sf_dir); ``oracle_sql()`` provides the DuckDB-equivalent SQL where
the operator is SQL-expressible (approximate sketches — HLL estimate,
t-digest, simhash, langid, fingerprints — get rows-only checks, asserted
against exact answers / published bounds in tests/ instead).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: heavy-hitter trigrams via
    the distributed CMS (count → tree-merge → broadcast → select)."""
    from epichypersketch_jl_ray.pipelines.ngrams import heavy_ngrams

    return heavy_ngrams("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from epichypersketch_jl_ray.pipelines import (
        ann,
        curate,
        dedup,
        motifs,
        multimodal,
        ngrams,
        relational,
        sketches,
        textstats,
        webpages,
        windowfns,
    )

    return {
        # core reference semantics (CMS motif enumeration, SURVEY.md §2.3)
        "motifs_ordinary": motifs.motifs_ordinary,
        "motifs_ordinary_k4": motifs.motifs_ordinary_k4,
        "motifs_ordinary_k5": motifs.motifs_ordinary_k5,
        "motifs_conv": motifs.motifs_conv,
        "motifs_conv_k4": motifs.motifs_conv_k4,
        # webtext CMS heavy hitters + flagship 4-sketch build
        "heavy_ngrams": ngrams.heavy_ngrams,
        "heavy_ngrams_by_lang": ngrams.heavy_ngrams_by_lang,
        "web_sketch_summary": webpages.web_sketch_summary,
        # sketch suite (north_rule A4-A7)
        "distinct_users_hll": sketches.distinct_users_hll,
        "distinct_users_exact": sketches.distinct_users_exact,
        "distinct_users_by_type": sketches.distinct_users_by_type,
        "user_overlap_theta": sketches.user_overlap_theta,
        "distinct_users_by_type_exact": sketches.distinct_users_by_type_exact,
        "doc_length_quantiles_kll": sketches.doc_length_quantiles_kll,
        "doc_length_quantiles_by_lang": sketches.doc_length_quantiles_by_lang,
        "doc_length_quantiles_tdigest": sketches.doc_length_quantiles_tdigest,
        "doc_length_quantiles_dd": sketches.doc_length_quantiles_dd,
        "user_membership_bloom": sketches.user_membership_bloom,
        "top_ngrams_spacesaving": sketches.top_ngrams_spacesaving,
        "top_ngrams_by_lang_spacesaving": sketches.top_ngrams_by_lang_spacesaving,
        "top_suppliers_spacesaving": sketches.top_suppliers_spacesaving,
        "top_suppliers_countsketch": sketches.top_suppliers_countsketch,
        "doc_sample": sketches.doc_sample,
        "doc_sample_by_lang": sketches.doc_sample_by_lang,
        # dedup suite
        "dedup_exact": dedup.dedup_exact,
        "dedup_minhash_lsh": dedup.dedup_minhash_lsh,
        "dedup_ngram_jaccard": dedup.dedup_ngram_jaccard,
        "dedup_simhash": dedup.dedup_simhash,
        "dedup_embedding": dedup.dedup_embedding,
        "dedup_embedding_lsh": dedup.dedup_embedding_lsh,
        "curate_corpus": curate.curate_corpus,
        "curate_corpus_cc": curate.curate_corpus_cc,
        # similarity search
        "ann_cosine_topk": ann.ann_cosine_topk,
        "ann_lsh_topk": ann.ann_lsh_topk,
        "ann_ivf_topk": ann.ann_ivf_topk,
        "embedding_principal_components": ann.embedding_principal_components,
        # multimodal (REAL decode: bmp / wav-pcm / raw video; compressed
        # formats remain documented codec seams)
        "image_features": multimodal.image_features,
        "video_frame_features": multimodal.video_frame_features,
        "audio_window_features": multimodal.audio_window_features,
        # text analysis
        "doc_stats": textstats.doc_stats,
        "token_count_bpe": textstats.token_count_bpe,
        "lang_predict": textstats.lang_predict,
        "doc_fingerprints": textstats.doc_fingerprints,
        "export_by_lang": textstats.export_by_lang,
        # relational operators
        "pricing_summary": relational.pricing_summary,
        "top_suppliers": relational.top_suppliers,
        "revenue_by_nation": relational.revenue_by_nation,
        "sessionize": relational.sessionize,
        "windowed_events": relational.windowed_events,
        "hopping_events": relational.hopping_events,
        "part_revenue_by_brand": relational.part_revenue_by_brand,
        "clicks_last_purchase": relational.clicks_last_purchase,
        "clicks_after_purchase": relational.clicks_after_purchase,
        "parts_never_discounted": relational.parts_never_discounted,
        "users_intersection": relational.users_intersection,
        "click_only_user_hours": relational.click_only_user_hours,
        "customer_order_counts": relational.customer_order_counts,
        "event_props_by_type": relational.event_props_by_type,
        "local_supplier_volume": relational.local_supplier_volume,
        # window-function analogues (grouped top-N / running total / rollup)
        "top_parts_per_brand": windowfns.top_parts_per_brand,
        "user_cumulative_spend": windowfns.user_cumulative_spend,
        "user_purchase_gaps": windowfns.user_purchase_gaps,
        "user_spend_quartile": windowfns.user_spend_quartile,
        "user_spend_percentile": windowfns.user_spend_percentile,
        "revenue_rollup": windowfns.revenue_rollup,
    }


def oracle_sql() -> dict[str, str]:
    from epichypersketch_jl_ray.pipelines import (
        ann,
        curate,
        dedup,
        motifs,
        ngrams,
        relational,
        sketches,
        textstats,
        windowfns,
    )

    return {
        "motifs_ordinary": motifs.motifs_ordinary_sql(),
        "motifs_ordinary_k4": motifs.motifs_ordinary_k4_sql(),
        "motifs_ordinary_k5": motifs.motifs_ordinary_k5_sql(),
        "motifs_conv": motifs.motifs_conv_sql(),
        "motifs_conv_k4": motifs.motifs_conv_k4_sql(),
        "heavy_ngrams": ngrams.heavy_ngrams_sql(),
        "heavy_ngrams_by_lang": ngrams.heavy_ngrams_by_lang_sql(),
        "distinct_users_exact": sketches.distinct_users_exact_sql(),
        "distinct_users_by_type_exact": sketches.distinct_users_by_type_exact_sql(),
        "doc_length_quantiles_kll": sketches.doc_length_quantiles_kll_sql(),
        "doc_length_quantiles_by_lang": sketches.doc_length_quantiles_by_lang_sql(),
        "user_membership_bloom": sketches.user_membership_bloom_sql(),
        "top_ngrams_spacesaving": sketches.top_ngrams_spacesaving_sql(),
        "top_ngrams_by_lang_spacesaving": sketches.top_ngrams_by_lang_spacesaving_sql(),
        "top_suppliers_spacesaving": sketches.top_suppliers_spacesaving_sql(),
        "dedup_exact": dedup.dedup_exact_sql(),
        "dedup_minhash_lsh": dedup.dedup_minhash_lsh_sql(),
        "dedup_ngram_jaccard": dedup.dedup_ngram_jaccard_sql(),
        "dedup_embedding": dedup.dedup_embedding_sql(),
        "curate_corpus": curate.curate_corpus_sql(),
        "curate_corpus_cc": curate.curate_corpus_cc_sql(),
        "ann_cosine_topk": ann.ann_cosine_topk_sql(),
        "doc_stats": textstats.doc_stats_sql(),
        "token_count_bpe": textstats.token_count_bpe_sql(),
        "export_by_lang": textstats.export_by_lang_sql(),
        "pricing_summary": relational.pricing_summary_sql(),
        "top_suppliers": relational.top_suppliers_sql(),
        "revenue_by_nation": relational.revenue_by_nation_sql(),
        "sessionize": relational.sessionize_sql(),
        "windowed_events": relational.windowed_events_sql(),
        "hopping_events": relational.hopping_events_sql(),
        "part_revenue_by_brand": relational.part_revenue_by_brand_sql(),
        "clicks_last_purchase": relational.clicks_last_purchase_sql(),
        "clicks_after_purchase": relational.clicks_after_purchase_sql(),
        "parts_never_discounted": relational.parts_never_discounted_sql(),
        "users_intersection": relational.users_intersection_sql(),
        "click_only_user_hours": relational.click_only_user_hours_sql(),
        "customer_order_counts": relational.customer_order_counts_sql(),
        "event_props_by_type": relational.event_props_by_type_sql(),
        "local_supplier_volume": relational.local_supplier_volume_sql(),
        "top_parts_per_brand": windowfns.top_parts_per_brand_sql(),
        "user_cumulative_spend": windowfns.user_cumulative_spend_sql(),
        "user_purchase_gaps": windowfns.user_purchase_gaps_sql(),
        "user_spend_quartile": windowfns.user_spend_quartile_sql(),
        "user_spend_percentile": windowfns.user_spend_percentile_sql(),
        "revenue_rollup": windowfns.revenue_rollup_sql(),
    }
