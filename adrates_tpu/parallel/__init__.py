from .book import (BookAggregate, BookTensors, aggregate_book,
                   aggregate_total_pv, book_analytics, book_pvs,
                   compile_book, compile_book_buckets, make_book_fn,
                   make_bucketed_book_fn, make_pershard_aggregate_fn,
                   make_sharded_book_fn, merge_aggregates, shard_book,
                   tile_book)
