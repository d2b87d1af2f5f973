"""Engine operators: relational primitives, dedup family, similarity
search, multimodal plumbing. Each operator is a pure function
``DataFrame -> DataFrame`` so plans compose them declaratively and
Catalyst sees the whole tree."""
