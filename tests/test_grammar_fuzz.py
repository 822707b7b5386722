"""Fuzz/property tests for the text-grammar parsers and tokenizers: random
corruption never crashes, round-trip properties hold on valid inputs."""

import random

import numpy as np

from glearning_benchmark_tpu.data import generator as G
from glearning_benchmark_tpu.data.text_grammar import (
    parse_distance_label_from_text,
    parse_graph_from_text,
    parse_query_nodes_from_text,
    parse_yes_no_from_text,
    text_record_to_graph,
)
from glearning_benchmark_tpu.tokenization import build_vocab_from_texts, encode_text
from glearning_benchmark_tpu.tokenization.sent import TrailTokenizer


def _corrupt(text: str, rng: random.Random) -> str:
    toks = text.split()
    for _ in range(rng.randint(1, 6)):
        op = rng.randint(0, 3)
        if not toks:
            break
        i = rng.randrange(len(toks))
        if op == 0:
            del toks[i]
        elif op == 1:
            toks.insert(i, rng.choice(["<e>", "<q>", "<p>", "junk", "-3", "999999", ""]))
        elif op == 2:
            toks[i] = rng.choice(["xx", "<n>", "INF", "len99", "<bos>"])
        else:
            toks[i], toks[-1] = toks[-1], toks[i]
    return " ".join(toks)


def test_parsers_never_crash_on_corruption():
    rng = random.Random(0)
    base = []
    for algo in ("er", "ba", "path"):
        g = G.generate_graph(algo, 3)
        base.append(G.cycle_check_records(g)[0]["text"])
        base.extend(r["text"] for r in G.shortest_path_records(g, max_pairs=2, seed=1))
    for text in base:
        for _ in range(20):
            t = _corrupt(text, rng)
            parse_yes_no_from_text(t)
            parse_distance_label_from_text(t)
            parse_query_nodes_from_text(t)
            nodes, edges = parse_graph_from_text(t)
            assert isinstance(nodes, list) and isinstance(edges, list)
            text_record_to_graph(t, task="cycle_check")
            text_record_to_graph(t, task="shortest_path")


def test_encode_never_crashes_on_corruption():
    rng = random.Random(1)
    g = G.generate_graph("sbm", 2)
    text = G.cycle_check_records(g)[0]["text"]
    vocab, _ = build_vocab_from_texts([text])
    for _ in range(50):
        t = _corrupt(text, rng)
        ids = encode_text(t, vocab, max_len=64)
        assert len(ids) <= 64
        assert (ids >= 0).all() and (ids < len(vocab)).all()


def test_sent_edge_multiset_property():
    """For any generated graph, the decoded trail covers exactly the edge
    multiset (SENT correctness invariant), across many seeds."""
    for algo in ("er", "ba", "sbm", "star"):
        for seed in range(12):
            g = G.generate_graph(algo, 100 + seed)
            tok = TrailTokenizer(max_length=10 ** 6, truncation_length=10 ** 6)
            tok.set_num_nodes(g.num_nodes)
            tokens = tok(g)
            # walk: consecutive node ids within a trail are edges
            prev = None
            got = set()
            for t in tokens[1:-1]:
                t = int(t)
                if t < 6:
                    prev = None if t == 1 else prev  # RESET clears; LADJ/RADJ no-op
                    continue
                node = t - tok.idx_offset
                if prev is not None:
                    got.add(tuple(sorted((prev, node))))
                prev = node
            want = {tuple(sorted(map(int, e))) for e in g.edges}
            assert got == want, (algo, seed)


def test_generator_extreme_seeds():
    for algo in G.ALGORITHMS:
        for seed in (0, 2 ** 31 - 1, 123456789):
            g = G.generate_graph(algo, seed)
            assert g.num_nodes >= 2
            if g.num_edges:
                assert g.edges.max() < g.num_nodes
                assert g.edges.min() >= 0
