// xgnn-convert — dataset preparation toolkit (C++ CLI).
//
// Native analog of the reference's datagen/utility tooling:
//  - COO edge list → CSR in the framework's binary layout
//    (datagen/*_csr_generator, utility/data-process/dataset/*)
//  - cache ranking generation: cache_by_degree / cache_by_random
//    (utility/data-process/toolkit/cache/cache_by_{degree,random}.cc)
//  - degree files (in_degrees.bin / out_degrees.bin)
//
// Subcommands:
//   xgnn-convert coo2csr  <edges.bin(u32 pairs)> <out_dir> <num_node>
//   xgnn-convert degrees  <dataset_dir>
//   xgnn-convert cache-by-degree <dataset_dir>
//   xgnn-convert cache-by-random <dataset_dir> [seed]
//   xgnn-convert cache-by-degree-hop <dataset_dir>
//   xgnn-convert cache-by-heuristic <dataset_dir>
//   xgnn-convert create-weights <dataset_dir> [seed]
//   xgnn-convert nodeset <dataset_dir> <n_train> <n_valid> <n_test> [seed]
//     (toolkit/generator/nodeset_generator.cc analog; the 32to64 converter
//      is obviated by the loader's uint32 big-offset path, dataset.py)
//   xgnn-convert probe-bandwidth [gb]      (toolkit/bandwidth analog)
//   xgnn-convert probe-memory <pid|self>   (toolkit/memory analog)
//
// create-weights emits prob_table.bin / alias_table.bin /
// prob_prefix_table.bin for the weighted sampling family (reference
// utility/data-process/toolkit/weight/create_alias_table.cc; loaded at
// samgraph/common/engine.cc:360-380).  Alias entries are GLOBAL destination
// node ids, identical to the reference binary format.
//
// All outputs follow the byte layout in xgnn_tpu/constants.py (identical to
// the reference's: uint32 CSR, meta.txt KEY VALUE).

#include <sys/mman.h>
#include <time.h>

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <fstream>
#include <numeric>
#include <random>
#include <string>
#include <vector>

namespace {

std::vector<uint32_t> read_u32(const std::string &path) {
  std::ifstream f(path, std::ios::binary | std::ios::ate);
  if (!f) {
    fprintf(stderr, "cannot open %s\n", path.c_str());
    exit(1);
  }
  size_t bytes = f.tellg();
  f.seekg(0);
  std::vector<uint32_t> v(bytes / sizeof(uint32_t));
  f.read(reinterpret_cast<char *>(v.data()), bytes);
  return v;
}

void write_u32(const std::string &path, const std::vector<uint32_t> &v) {
  std::ofstream f(path, std::ios::binary);
  f.write(reinterpret_cast<const char *>(v.data()),
          v.size() * sizeof(uint32_t));
}

long read_meta_num_node(const std::string &dir) {
  std::ifstream f(dir + "/meta.txt");
  std::string k;
  long v;
  while (f >> k >> v) {
    if (k == "NUM_NODE") return v;
  }
  fprintf(stderr, "NUM_NODE not in %s/meta.txt\n", dir.c_str());
  exit(1);
}

int cmd_coo2csr(const std::string &edges_path, const std::string &out_dir,
                uint32_t num_node) {
  std::vector<uint32_t> coo = read_u32(edges_path);
  size_t num_edge = coo.size() / 2;
  // counting sort by src → indptr
  std::vector<uint32_t> indptr(num_node + 1, 0);
  for (size_t e = 0; e < num_edge; ++e) indptr[coo[2 * e] + 1]++;
  for (uint32_t v = 0; v < num_node; ++v) indptr[v + 1] += indptr[v];
  std::vector<uint32_t> indices(num_edge);
  std::vector<uint32_t> cursor(indptr.begin(), indptr.end() - 1);
  for (size_t e = 0; e < num_edge; ++e)
    indices[cursor[coo[2 * e]]++] = coo[2 * e + 1];
  // sort each adjacency row (canonical form, enables binary search)
  for (uint32_t v = 0; v < num_node; ++v)
    std::sort(indices.begin() + indptr[v], indices.begin() + indptr[v + 1]);
  write_u32(out_dir + "/indptr.bin", indptr);
  write_u32(out_dir + "/indices.bin", indices);
  std::ofstream meta(out_dir + "/meta.txt");
  meta << "NUM_NODE " << num_node << "\nNUM_EDGE " << num_edge << "\n";
  printf("coo2csr: %u nodes %zu edges\n", num_node, num_edge);
  return 0;
}

int cmd_degrees(const std::string &dir) {
  long n = read_meta_num_node(dir);
  std::vector<uint32_t> indptr = read_u32(dir + "/indptr.bin");
  std::vector<uint32_t> indices = read_u32(dir + "/indices.bin");
  std::vector<uint32_t> out_deg(n), in_deg(n, 0);
  for (long v = 0; v < n; ++v) out_deg[v] = indptr[v + 1] - indptr[v];
  for (uint32_t u : indices) in_deg[u]++;
  write_u32(dir + "/out_degrees.bin", out_deg);
  write_u32(dir + "/in_degrees.bin", in_deg);
  printf("degrees: wrote in/out degree files for %ld nodes\n", n);
  return 0;
}

int cmd_cache_by_degree(const std::string &dir) {
  long n = read_meta_num_node(dir);
  std::vector<uint32_t> indptr = read_u32(dir + "/indptr.bin");
  std::vector<uint32_t> rank(n);
  std::iota(rank.begin(), rank.end(), 0);
  // shuffle before the stable sort → random tie-break, matching the
  // reference's partition-cache ranking treatment
  std::mt19937 rng(0);
  std::shuffle(rank.begin(), rank.end(), rng);
  std::stable_sort(rank.begin(), rank.end(),
                   [&](uint32_t a, uint32_t b) {
                     return indptr[a + 1] - indptr[a] > indptr[b + 1] - indptr[b];
                   });
  write_u32(dir + "/cache_by_degree.bin", rank);
  printf("cache_by_degree: wrote ranking of %ld nodes\n", n);
  return 0;
}

int cmd_cache_by_random(const std::string &dir, unsigned seed) {
  long n = read_meta_num_node(dir);
  std::vector<uint32_t> rank(n);
  std::iota(rank.begin(), rank.end(), 0);
  std::mt19937 rng(seed);
  std::shuffle(rank.begin(), rank.end(), rng);
  write_u32(dir + "/cache_by_random.bin", rank);
  printf("cache_by_random: wrote ranking of %ld nodes\n", n);
  return 0;
}

void write_f32(const std::string &path, const std::vector<float> &v) {
  std::ofstream f(path, std::ios::binary);
  f.write(reinterpret_cast<const char *>(v.data()), v.size() * sizeof(float));
}

// cache_by_degree_hop.cc analog: rank nodes reachable within 2 hops of the
// train set by their degree restricted to the reachable subgraph, then the
// rest by plain degree.
int cmd_cache_by_degree_hop(const std::string &dir) {
  long n = read_meta_num_node(dir);
  std::vector<uint32_t> indptr = read_u32(dir + "/indptr.bin");
  std::vector<uint32_t> indices = read_u32(dir + "/indices.bin");
  std::vector<uint32_t> train = read_u32(dir + "/train_set.bin");
  std::vector<uint8_t> touched(n, 0);
  for (uint32_t t : train) touched[t] = 1;
  for (int hop = 0; hop < 2; ++hop) {  // hopNodes(dataset, 2)
    std::vector<uint8_t> next = touched;
#pragma omp parallel for schedule(dynamic, 4096)
    for (long v = 0; v < n; ++v) {
      if (!touched[v]) continue;
      for (uint32_t e = indptr[v]; e < indptr[v + 1]; ++e) {
        // concurrent same-value stores from different threads are a data
        // race under the C++ memory model; make the store atomic
        uint8_t &slot = next[indices[e]];
#pragma omp atomic write
        slot = 1;
      }
    }
    touched.swap(next);
  }
  std::vector<uint32_t> score(n, 0);
#pragma omp parallel for schedule(dynamic, 4096)
  for (long v = 0; v < n; ++v) {
    if (!touched[v]) continue;
    uint32_t s = 0;
    for (uint32_t e = indptr[v]; e < indptr[v + 1]; ++e)
      s += touched[indices[e]];
    score[v] = s;
  }
  std::vector<uint32_t> rank(n);
  std::iota(rank.begin(), rank.end(), 0);
  std::stable_sort(rank.begin(), rank.end(), [&](uint32_t a, uint32_t b) {
    if (touched[a] != touched[b]) return touched[a] > touched[b];
    uint32_t da = touched[a] ? score[a] : indptr[a + 1] - indptr[a];
    uint32_t db = touched[b] ? score[b] : indptr[b + 1] - indptr[b];
    return da > db;
  });
  write_u32(dir + "/cache_by_degree_hop.bin", rank);
  printf("cache_by_degree_hop: wrote ranking of %ld nodes\n", n);
  return 0;
}

// cache_by_heuristic.cc analog: train set first, then its 1-hop frontier,
// then everything else by descending degree.
int cmd_cache_by_heuristic(const std::string &dir) {
  long n = read_meta_num_node(dir);
  std::vector<uint32_t> indptr = read_u32(dir + "/indptr.bin");
  std::vector<uint32_t> indices = read_u32(dir + "/indices.bin");
  std::vector<uint32_t> train = read_u32(dir + "/train_set.bin");
  std::vector<uint8_t> added(n, 0);
  std::vector<uint32_t> rank;
  rank.reserve(n);
  for (uint32_t t : train)
    if (!added[t]) { rank.push_back(t); added[t] = 1; }
  for (uint32_t t : train)
    for (uint32_t e = indptr[t]; e < indptr[t + 1]; ++e) {
      uint32_t u = indices[e];
      if (!added[u]) { rank.push_back(u); added[u] = 1; }
    }
  std::vector<uint32_t> rest;
  rest.reserve(n - rank.size());
  for (long v = 0; v < n; ++v)
    if (!added[v]) rest.push_back(v);
  std::stable_sort(rest.begin(), rest.end(), [&](uint32_t a, uint32_t b) {
    return indptr[a + 1] - indptr[a] > indptr[b + 1] - indptr[b];
  });
  rank.insert(rank.end(), rest.begin(), rest.end());
  write_u32(dir + "/cache_by_heuristic.bin", rank);
  printf("cache_by_heuristic: wrote ranking of %ld nodes\n", n);
  return 0;
}

// create_alias_table.cc analog: random integer edge weights (kDefault
// policy), per-node alias tables + prefix-sum tables, OMP-parallel.
// Alias entries are GLOBAL node ids (create_alias_table.cc:152).
int cmd_create_weights(const std::string &dir, unsigned seed) {
  long n = read_meta_num_node(dir);
  std::vector<uint32_t> indptr = read_u32(dir + "/indptr.bin");
  std::vector<uint32_t> indices = read_u32(dir + "/indices.bin");
  size_t num_edge = indices.size();
  std::vector<float> prob(num_edge, 0.f), prefix(num_edge, 0.f);
  std::vector<uint32_t> alias(num_edge, 0);
#pragma omp parallel for schedule(dynamic, 1024)
  for (long v = 0; v < n; ++v) {
    uint32_t off = indptr[v], len = indptr[v + 1] - off;
    if (len == 0) continue;
    std::mt19937 rng(seed ^ (0x9E3779B9u * (uint32_t)v));
    std::uniform_int_distribution<int> dist(1, 10);
    std::vector<float> w(len);
    double sum = 0;
    for (uint32_t i = 0; i < len; ++i) { w[i] = (float)dist(rng); sum += w[i]; }
    double acc = 0;
    for (uint32_t i = 0; i < len; ++i) {
      acc += w[i];
      prefix[off + i] = (float)acc;
      w[i] = (float)(w[i] / sum * len);
    }
    std::deque<uint32_t> smalls, larges;
    for (uint32_t i = 0; i < len; ++i)
      (w[i] < 1.f ? smalls : larges).push_back(i);
    for (uint32_t i = 0; i < len; ++i) alias[off + i] = indices[off + i];
    while (!smalls.empty() && !larges.empty()) {
      uint32_t s = smalls.front(); smalls.pop_front();
      uint32_t l = larges.front(); larges.pop_front();
      prob[off + s] = w[s];
      alias[off + s] = indices[off + l];
      w[l] -= (1.f - w[s]);
      (w[l] < 1.f ? smalls : larges).push_back(l);
    }
    while (!larges.empty()) { prob[off + larges.front()] = 1.f; larges.pop_front(); }
    while (!smalls.empty()) { prob[off + smalls.front()] = 1.f; smalls.pop_front(); }
  }
  write_f32(dir + "/prob_table.bin", prob);
  write_u32(dir + "/alias_table.bin", alias);
  write_f32(dir + "/prob_prefix_table.bin", prefix);
  printf("create-weights: wrote alias/prob/prefix tables for %zu edges\n",
         num_edge);
  return 0;
}

// nodeset: draw distinct non-isolated nodes for train/valid/test set files
// (reference utility/data-process/toolkit/generator/nodeset_generator.cc:
// uniform draws, rejecting zero-degree and already-taken nodes).  Also
// updates the NUM_*_SET lines in meta.txt.
int cmd_nodeset(const std::string &dir, size_t n_train, size_t n_valid,
                size_t n_test, uint32_t seed) {
  std::vector<uint32_t> indptr = read_u32(dir + "/indptr.bin");
  size_t num_node = indptr.size() - 1;
  std::vector<bool> taken(num_node, false);
  std::mt19937 rng(seed);
  std::uniform_int_distribution<uint64_t> dist(0, num_node - 1);
  auto draw = [&](size_t n) {
    std::vector<uint32_t> out;
    out.reserve(n);
    size_t attempts = 0, limit = 100 * n + 1000000;
    while (out.size() < n && attempts++ < limit) {
      uint64_t v = dist(rng);
      if (indptr[v + 1] - indptr[v] > 0 && !taken[v]) {
        out.push_back((uint32_t)v);
        taken[v] = true;
      }
    }
    if (out.size() < n) {
      fprintf(stderr, "nodeset: only %zu/%zu non-isolated nodes found\n",
              out.size(), n);
      exit(1);
    }
    return out;
  };
  // draw ALL sets before touching any file: a failed later draw must not
  // leave train_set.bin rewritten against a stale meta.txt
  std::vector<uint32_t> tr = draw(n_train), va = draw(n_valid),
                        te = draw(n_test);
  write_u32(dir + "/train_set.bin", tr);
  write_u32(dir + "/valid_set.bin", va);
  write_u32(dir + "/test_set.bin", te);
  // rewrite the set sizes in meta.txt
  std::ifstream in(dir + "/meta.txt");
  std::string line, out_meta;
  while (std::getline(in, line)) {
    if (line.rfind("NUM_TRAIN_SET", 0) == 0 ||
        line.rfind("NUM_VALID_SET", 0) == 0 ||
        line.rfind("NUM_TEST_SET", 0) == 0)
      continue;
    out_meta += line + "\n";
  }
  in.close();
  out_meta += "NUM_TRAIN_SET " + std::to_string(n_train) + "\n";
  out_meta += "NUM_VALID_SET " + std::to_string(n_valid) + "\n";
  out_meta += "NUM_TEST_SET " + std::to_string(n_test) + "\n";
  std::ofstream mf(dir + "/meta.txt");
  mf << out_meta;
  printf("nodeset: %zu train / %zu valid / %zu test written\n", n_train,
         n_valid, n_test);
  return 0;
}

// probe-bandwidth: memcpy bandwidth of normal malloc memory vs an
// mlocked MAP_SHARED mapping (the reference's
// toolkit/bandwidth/mem_bandwidth.cc probe — decides whether pinned/shm
// pages copy differently on this host; feeds the host-tier H2D estimate).
int cmd_probe_bandwidth(size_t gb) {
  size_t mem = gb << 30, copy = 30u << 20, iters = 10;
  char *shm = (char *)mmap(nullptr, mem, PROT_READ | PROT_WRITE,
                           MAP_ANONYMOUS | MAP_SHARED, -1, 0);
  if (shm == MAP_FAILED) {
    fprintf(stderr, "probe-bandwidth: mmap(%zu GB) failed\n", gb);
    return 1;
  }
  bool locked = mlock(shm, mem) == 0;  // fails under RLIMIT_MEMLOCK —
  if (!locked)                         // label the result honestly
    fprintf(stderr,
            "probe-bandwidth: mlock failed (RLIMIT_MEMLOCK?) — shm pages "
            "are NOT pinned\n");
  char *src = (char *)malloc(mem);
  char *dst = (char *)malloc(mem);
  if (!src || !dst) {
    fprintf(stderr, "probe-bandwidth: malloc(%zu GB) failed\n", gb);
    return 1;
  }
  memset(src, 1, mem);
  memset(dst, 1, mem);
  memset(shm, 1, mem);
  auto now = [] {
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return ts.tv_sec + ts.tv_nsec * 1e-9;
  };
  double t_norm = 0, t_shm = 0;
  for (size_t i = 0; i < iters; ++i) {
    size_t o0 = (i * copy) % (mem - copy), o1 = mem - copy - o0;
    double t0 = now();
    memcpy(dst + o0, src + o0, copy);
    t_norm += now() - t0;
    double t1 = now();
    memcpy(shm + o1, src + o1, copy);
    t_shm += now() - t1;
  }
  printf("probe-bandwidth: malloc %.2f GB/s | %s-shm %.2f GB/s "
         "(%zu MB copies)\n",
         copy * iters / t_norm / 1e9, locked ? "mlocked" : "UNPINNED",
         copy * iters / t_shm / 1e9, copy >> 20);
  free(src);
  free(dst);
  munmap(shm, mem);
  return 0;
}

// probe-memory: RSS/peak of a process + host availability (the reference's
// toolkit/memory/memory.py observer, one-shot)
int cmd_probe_memory(const std::string &pid) {
  std::ifstream st("/proc/" + pid + "/status");
  std::string line;
  while (std::getline(st, line))
    if (line.rfind("VmRSS", 0) == 0 || line.rfind("VmHWM", 0) == 0)
      printf("%s\n", line.c_str());
  std::ifstream mi("/proc/meminfo");
  while (std::getline(mi, line))
    if (line.rfind("MemAvailable", 0) == 0 || line.rfind("MemTotal", 0) == 0)
      printf("%s\n", line.c_str());
  return 0;
}

}  // namespace

int main(int argc, char **argv) {
  if (argc < 3) {
    fprintf(stderr,
            "usage: xgnn-convert <coo2csr|degrees|cache-by-degree|"
            "cache-by-random|cache-by-degree-hop|cache-by-heuristic|"
            "create-weights|nodeset|probe-bandwidth|probe-memory> "
            "args...\n");
    return 1;
  }
  std::string cmd = argv[1];
  if (cmd == "coo2csr" && argc == 5)
    return cmd_coo2csr(argv[2], argv[3], static_cast<uint32_t>(atol(argv[4])));
  if (cmd == "degrees") return cmd_degrees(argv[2]);
  if (cmd == "cache-by-degree") return cmd_cache_by_degree(argv[2]);
  if (cmd == "cache-by-random")
    return cmd_cache_by_random(argv[2], argc > 3 ? atoi(argv[3]) : 0);
  if (cmd == "cache-by-degree-hop") return cmd_cache_by_degree_hop(argv[2]);
  if (cmd == "cache-by-heuristic") return cmd_cache_by_heuristic(argv[2]);
  if (cmd == "create-weights")
    return cmd_create_weights(argv[2], argc > 3 ? atoi(argv[3]) : 0);
  if (cmd == "nodeset" && argc >= 6)
    return cmd_nodeset(argv[2], atol(argv[3]), atol(argv[4]), atol(argv[5]),
                       argc > 6 ? atoi(argv[6]) : 0);
  if (cmd == "probe-bandwidth")
    return cmd_probe_bandwidth(argc > 2 ? atol(argv[2]) : 1);
  if (cmd == "probe-memory") return cmd_probe_memory(argv[2]);
  fprintf(stderr, "bad subcommand/args\n");
  return 1;
}
