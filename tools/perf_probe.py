import sys, time
sys.path.insert(0, '/root/repo')
from pmc_conversion_spark.session import get_spark
import __spark_entry__ as E
spark = get_spark('perf7')
qs = E.queries()
spark.range(1).count()
names = sys.argv[1:] or ['dedup_ngram_jaccard','dedup_embedding_cosine','dedup_embedding_cosine_blocked','dedup_minhash_lsh','dedup_simhash','mm_decode_stub','sim_topk_bruteforce']
for name in names:
    t0=time.time(); n = qs[name](spark, '/root/testdata/sf0.1').count()
    print(f'{name}: {time.time()-t0:.1f}s rows={n}', flush=True)
