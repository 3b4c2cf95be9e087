// TAGAN-TPU native host-side snapshot packer.
//
// The data-loader hot path: converting ragged snapshot sequences
// (per-snapshot node features, COO edges, global node IDs) into the
// framework's static-shape slot-space buffers (core/graph.py
// `build_sequence`). Pure Python does this with dict lookups and
// per-edge indexing; for large temporal graphs (the BASELINE 10K-node /
// 600K-edge configs) that loop dominates ingestion. This C++ version
// does the same packing with sorted-array slot lookup and tight loops,
// exposed through a C ABI consumed via ctypes
// (tagan_tpu/native/__init__.py). Python remains the fallback and the
// semantics oracle (tests/test_native.py compares the two).
//
// Layout contract (must match core/graph.py build_sequence):
//   x         f32[T, N, F]     node features scattered to slots
//   node_mask u8 [T, N]
//   adj       u8 [T, N, N]
//   edge_src  i32[T, E]        COO source slot (0 where padded)
//   edge_dst  i32[T, E]
//   edge_mask u8 [T, E]
//   edge_attr f32[T, E, Fe]
//   node_ids  i32[N]           global ID per slot (-1 padding)
//
// Build: make -C tagan_tpu/native   (produces libtagan_packer.so)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Collect sorted unique node IDs over all snapshots.
// ids_concat: all snapshots' node-id lists concatenated; counts[t] =
// number of ids in snapshot t. out_unique must hold >= total entries.
// Returns the number of unique IDs (or -1 on overflow of max_nodes).
int64_t tagan_unique_ids(const int64_t* ids_concat, const int64_t* counts,
                         int64_t num_steps, int64_t max_nodes,
                         int64_t* out_unique) {
    int64_t total = 0;
    for (int64_t t = 0; t < num_steps; ++t) total += counts[t];
    std::vector<int64_t> ids(ids_concat, ids_concat + total);
    std::sort(ids.begin(), ids.end());
    ids.erase(std::unique(ids.begin(), ids.end()), ids.end());
    if ((int64_t)ids.size() > max_nodes) return -1;
    std::memcpy(out_unique, ids.data(), ids.size() * sizeof(int64_t));
    return (int64_t)ids.size();
}

// Pack one full sequence into preallocated slot-space buffers.
//
// Inputs (concatenated over snapshots, with per-snapshot counts):
//   x_concat       f32[sum(n_t), F]
//   ids_concat     i64[sum(n_t)]
//   edges_concat   i64[2, e_t] blocks laid out per snapshot as
//                  src row then dst row (i.e. [e_t src..., e_t dst...])
//   eattr_concat   f32[sum(e_t), Fe] (may be null when Fe == 0)
//   node_counts    i64[T], edge_counts i64[T]
//   times          f64[T] (optional; null -> step index)
//   unique_ids     i64[n_unique] sorted (from tagan_unique_ids)
//
// Returns 0 on success, negative on error:
//   -2 edge count exceeds max_edges, -3 step count exceeds max_time,
//   -4 unknown node id in edge list.
int32_t tagan_pack_sequence(
    const float* x_concat, const int64_t* ids_concat,
    const int64_t* edges_concat, const float* eattr_concat,
    const int64_t* node_counts, const int64_t* edge_counts,
    const double* times_in,
    const int64_t* unique_ids, int64_t n_unique,
    int64_t num_steps, int64_t feat_dim, int64_t edge_feat_dim,
    int64_t max_time, int64_t max_nodes, int64_t max_edges,
    int32_t dense_adj,   // 0: skip adjacency entirely (adj_out may be 1x1)
    // outputs
    float* x_out, uint8_t* node_mask_out, uint8_t* adj_out,
    int32_t* edge_src_out, int32_t* edge_dst_out, uint8_t* edge_mask_out,
    float* edge_attr_out, float* times_out, uint8_t* time_mask_out,
    int32_t* node_ids_out) {

    if (num_steps > max_time) return -3;

    // zero all outputs
    std::memset(x_out, 0, sizeof(float) * max_time * max_nodes * feat_dim);
    std::memset(node_mask_out, 0, max_time * max_nodes);
    if (dense_adj)
        std::memset(adj_out, 0, max_time * max_nodes * max_nodes);
    std::memset(edge_src_out, 0, sizeof(int32_t) * max_time * max_edges);
    std::memset(edge_dst_out, 0, sizeof(int32_t) * max_time * max_edges);
    std::memset(edge_mask_out, 0, max_time * max_edges);
    if (edge_feat_dim > 0)
        std::memset(edge_attr_out, 0,
                    sizeof(float) * max_time * max_edges * edge_feat_dim);
    std::memset(times_out, 0, sizeof(float) * max_time);
    std::memset(time_mask_out, 0, max_time);
    for (int64_t i = 0; i < max_nodes; ++i) node_ids_out[i] = -1;
    for (int64_t i = 0; i < n_unique; ++i)
        node_ids_out[i] = (int32_t)unique_ids[i];

    auto slot_of = [&](int64_t gid) -> int64_t {
        const int64_t* lo = std::lower_bound(unique_ids,
                                             unique_ids + n_unique, gid);
        if (lo == unique_ids + n_unique || *lo != gid) return -1;
        return lo - unique_ids;
    };

    int64_t node_off = 0, edge_off = 0, eattr_off = 0;
    for (int64_t t = 0; t < num_steps; ++t) {
        const int64_t n_t = node_counts[t];
        const int64_t e_t = edge_counts[t];
        if (e_t > max_edges) return -2;

        // per-snapshot row -> slot map
        std::vector<int64_t> row_slot(n_t);
        for (int64_t r = 0; r < n_t; ++r) {
            int64_t s = slot_of(ids_concat[node_off + r]);
            if (s < 0) return -4;
            row_slot[r] = s;
            node_mask_out[t * max_nodes + s] = 1;
            std::memcpy(x_out + (t * max_nodes + s) * feat_dim,
                        x_concat + (node_off + r) * feat_dim,
                        sizeof(float) * feat_dim);
        }

        const int64_t* esrc = edges_concat + edge_off;
        const int64_t* edst = esrc + e_t;
        for (int64_t e = 0; e < e_t; ++e) {
            int64_t rs = esrc[e], rd = edst[e];
            if (rs < 0 || rs >= n_t || rd < 0 || rd >= n_t) return -4;
            int64_t ss = row_slot[rs], sd = row_slot[rd];
            edge_src_out[t * max_edges + e] = (int32_t)ss;
            edge_dst_out[t * max_edges + e] = (int32_t)sd;
            edge_mask_out[t * max_edges + e] = 1;
            if (dense_adj)
                adj_out[(t * max_nodes + ss) * max_nodes + sd] = 1;
            if (edge_feat_dim > 0)
                std::memcpy(edge_attr_out
                                + (t * max_edges + e) * edge_feat_dim,
                            eattr_concat + (eattr_off + e) * edge_feat_dim,
                            sizeof(float) * edge_feat_dim);
        }

        times_out[t] = times_in ? (float)times_in[t] : (float)t;
        time_mask_out[t] = 1;

        node_off += n_t;
        edge_off += 2 * e_t;
        eattr_off += e_t;
    }
    return 0;
}

// Destination-sorted CSR build for one snapshot's padded COO
// (the host-side analog of core/graph.coo_to_csr): stable counting sort
// of valid edges by query node.
int32_t tagan_coo_to_csr(const int32_t* edge_q, const int32_t* edge_k,
                         const uint8_t* edge_mask, int64_t num_edges,
                         int64_t num_nodes,
                         int32_t* row_ptr_out,     // [num_nodes + 1]
                         int32_t* col_out,         // [num_edges]
                         int32_t* perm_out,        // [num_edges]
                         uint8_t* mask_out) {      // [num_edges]
    std::vector<int32_t> counts(num_nodes + 1, 0);
    for (int64_t e = 0; e < num_edges; ++e)
        if (edge_mask[e]) {
            if (edge_q[e] < 0 || edge_q[e] >= num_nodes) return -4;
            counts[edge_q[e]]++;
        }
    row_ptr_out[0] = 0;
    for (int64_t i = 0; i < num_nodes; ++i)
        row_ptr_out[i + 1] = row_ptr_out[i] + counts[i];
    std::vector<int32_t> cursor(row_ptr_out, row_ptr_out + num_nodes);
    int64_t invalid_cursor = row_ptr_out[num_nodes];
    for (int64_t e = 0; e < num_edges; ++e) {
        int64_t pos;
        if (edge_mask[e]) {
            pos = cursor[edge_q[e]]++;
            mask_out[pos] = 1;
        } else {
            pos = invalid_cursor++;
            mask_out[pos] = 0;
        }
        col_out[pos] = edge_k[e];
        perm_out[pos] = (int32_t)e;
    }
    return 0;
}

// Reverse Cuthill–McKee order over an undirected graph given as COO
// pairs in [0, n) index space (the union graph of a snapshot sequence;
// core/graph.py locality_order is the Python oracle). Deterministic:
// BFS components start at the unvisited node with the smallest
// (degree, index); neighbors are visited in ascending (degree, index);
// the visit order is reversed. Degree counts deduplicated neighbors,
// matching the Python set-based adjacency. Writes a permutation of
// 0..n-1 into out_order. Returns 0, or -4 on an out-of-range endpoint.
int32_t tagan_rcm_order(const int64_t* src, const int64_t* dst,
                        int64_t n_edges, int64_t n, int64_t* out_order) {
    // symmetric CSR (with duplicates), then per-row sort+unique
    std::vector<int64_t> cnt(n + 1, 0);
    for (int64_t e = 0; e < n_edges; ++e) {
        int64_t a = src[e], b = dst[e];
        if (a < 0 || a >= n || b < 0 || b >= n) return -4;
        if (a == b) continue;
        cnt[a + 1]++;
        cnt[b + 1]++;
    }
    for (int64_t i = 0; i < n; ++i) cnt[i + 1] += cnt[i];
    std::vector<int64_t> adj(cnt[n]);
    std::vector<int64_t> cur(cnt.begin(), cnt.end() - 1);
    for (int64_t e = 0; e < n_edges; ++e) {
        int64_t a = src[e], b = dst[e];
        if (a == b) continue;
        adj[cur[a]++] = b;
        adj[cur[b]++] = a;
    }
    std::vector<int64_t> row_end(n);
    for (int64_t i = 0; i < n; ++i) {
        int64_t lo = cnt[i], hi = cnt[i + 1];
        std::sort(adj.begin() + lo, adj.begin() + hi);
        row_end[i] = std::unique(adj.begin() + lo, adj.begin() + hi)
                     - adj.begin();
    }
    std::vector<int64_t> deg(n);
    for (int64_t i = 0; i < n; ++i) deg[i] = row_end[i] - cnt[i];
    // neighbor lists sorted by (degree, index)
    for (int64_t i = 0; i < n; ++i)
        std::sort(adj.begin() + cnt[i], adj.begin() + row_end[i],
                  [&](int64_t a, int64_t b) {
                      return deg[a] != deg[b] ? deg[a] < deg[b] : a < b;
                  });
    // start nodes in ascending (degree, index)
    std::vector<int64_t> starts(n);
    for (int64_t i = 0; i < n; ++i) starts[i] = i;
    std::sort(starts.begin(), starts.end(),
              [&](int64_t a, int64_t b) {
                  return deg[a] != deg[b] ? deg[a] < deg[b] : a < b;
              });
    std::vector<uint8_t> visited(n, 0);
    std::vector<int64_t> queue;
    queue.reserve(n);
    int64_t emitted = 0;
    for (int64_t s : starts) {
        if (visited[s]) continue;
        visited[s] = 1;
        int64_t head = queue.size();
        queue.push_back(s);
        while (head < (int64_t)queue.size()) {
            int64_t u = queue[head++];
            out_order[emitted++] = u;
            for (int64_t p = cnt[u]; p < row_end[u]; ++p) {
                int64_t w = adj[p];
                if (!visited[w]) {
                    visited[w] = 1;
                    queue.push_back(w);
                }
            }
        }
    }
    std::reverse(out_order, out_order + emitted);
    return 0;
}

}  // extern "C"
