"""Frozen BPE tokenizer snapshot: 24 merges trained on sf0.01 documents
(top 500 words, deterministic arg-max tie-break on (count desc, lhs,
rhs)) plus the doc_id<5 encode rows — the snapshot oracles of
`bpe_train_merges` / `bpe_encode` (the embed_mock/pq_kmeans trick for
non-SQL-expressible training). A pytest retrains with an INDEPENDENT
pure-Python BPE reimplementation and asserts merge-table equality, so
drift fails locally and loudly, never at the driver gate.
"""

BPE_MERGES_SF001 = [
    (0, 'e', 'r', 4568),
    (1, 'e', '</w>', 4473),
    (2, 'n', '</w>', 2834),
    (3, 'er', '</w>', 2779),
    (4, 'o', 'w', 2747),
    (5, 'ow', '</w>', 2747),
    (6, 'o', 'r', 2696),
    (7, 's', 't', 2676),
    (8, 'h', '</w>', 1884),
    (9, 'a', 't', 1845),
    (10, 'l', 'u', 1831),
    (11, 'i', 'n', 1796),
    (12, 'a', '</w>', 1788),
    (13, 'g', '</w>', 1777),
    (14, 'y', '</w>', 1767),
    (15, 'a', 'r', 1758),
    (16, 'p', 'ar', 1758),
    (17, 't', '</w>', 1750),
    (18, 'i', 'n</w>', 964),
    (19, 'j', 'o', 964),
    (20, 'jo', 'in</w>', 964),
    (21, 'a', 's', 947),
    (22, 'as', 'h</w>', 947),
    (23, 'h', 'ash</w>', 947),
]

BPE_ENCODE_SF001 = [
    (0, 104, 'k e y</w> a g g</w> r ow</w> s c a n</w>'),
    (1, 277, 'b at c h</w> w in d ow</w> s par k </w>'),
    (2, 181, 's m a l l </w> f a st </w> s l'),
    (3, 103, 'w in d ow</w> m er g e</w> s par k </w>'),
    (4, 169, 'd at a</w> q u er y</w> s m a l l'),
]
