"""Frozen quality-classifier coefficients: MLlib LogisticRegression
(maxIter=25, regParam=0.1) distilling the heuristic quality label
(quality >= 0.55) over 4 features (length, en-stopword ratio, punct
ratio, unique-word ratio) on sf0.01 documents. Training is
bit-deterministic across session configs (verified local[4]/7 vs
local[32]/32); a pytest retrains and asserts equality so drift fails
locally, never at the driver gate. Order: [intercept, w1, w2, w3, w4].
"""

LR_COEFS_SF001 = [0.468282478294569, 4.01074094434067, 9.100581719777876, 0.0, -5.595588730229997]
