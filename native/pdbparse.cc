// Fast multi-model PDB parser for atom37 ensembles.
//
// The evaluation pipeline reads MD reference trajectories as multi-MODEL PDB
// files with thousands of models; the Python line parser is the bottleneck
// there. This parser does a single pass over the text with fixed-column
// field extraction and writes directly into caller-provided atom37 arrays.
//
// Chemistry tables (the 37-atom vocabulary and 3-letter residue codes) are
// injected from Python at runtime (str2str_tpu/geometry/chemical.py) so the
// chemical data lives in exactly one place.
//
// C ABI (used via ctypes from str2str_tpu/io/native.py):
//   pdb_set_tables(...)            -- one-time vocabulary registration
//   pdb_scan(text, len, out_counts)-- count models/residues (pass 1)
//   pdb_parse(text, len, ...)      -- fill arrays (pass 2)

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

constexpr int kMaxAtoms = 64;  // >= atom vocabulary size (37)

std::unordered_map<std::string, int> g_atom_order;
std::unordered_map<std::string, int> g_res_order;  // 3-letter -> aatype
std::vector<std::string> g_atom_names;             // index -> atom name
std::vector<std::string> g_res_names;              // aatype -> 3-letter code
int g_unk_aatype = 20;

constexpr char kChainIds[] =
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789";
constexpr int kMaxChains = 62;

inline std::string strip(const char* s, int n) {
  int b = 0, e = n;
  while (b < e && s[b] == ' ') ++b;
  while (e > b && s[e - 1] == ' ') --e;
  return std::string(s + b, e - b);
}

// Fast fixed-width float parse (PDB coordinates are %8.3f).
inline float parse_float(const char* s, int n) {
  char buf[24];
  if (n > 23) n = 23;
  std::memcpy(buf, s, n);
  buf[n] = 0;
  return std::strtof(buf, nullptr);
}

inline int parse_int(const char* s, int n) {
  char buf[16];
  if (n > 15) n = 15;
  std::memcpy(buf, s, n);
  buf[n] = 0;
  return std::atoi(buf);
}

struct ResidueKey {
  char chain;
  int resseq;
  char icode;
  bool operator==(const ResidueKey& o) const {
    return chain == o.chain && resseq == o.resseq && icode == o.icode;
  }
};

struct KeyHash {
  size_t operator()(const ResidueKey& k) const {
    return (static_cast<size_t>(k.chain) << 40) ^
           (static_cast<size_t>(k.resseq) << 8) ^ static_cast<size_t>(k.icode);
  }
};

struct LineView {
  const char* p;
  int n;
};

// Iterate lines without copying.
template <typename F>
void for_each_line(const char* text, int64_t len, F&& fn) {
  const char* p = text;
  const char* end = text + len;
  while (p < end) {
    const char* nl = static_cast<const char*>(std::memchr(p, '\n', end - p));
    int n = nl ? static_cast<int>(nl - p) : static_cast<int>(end - p);
    fn(LineView{p, n});
    p = nl ? nl + 1 : end;
  }
}

inline bool is_atom_line(const LineView& l, bool* is_het) {
  if (l.n < 54) return false;
  if (std::memcmp(l.p, "ATOM  ", 6) == 0) { *is_het = false; return true; }
  if (std::memcmp(l.p, "HETATM", 6) == 0) { *is_het = true; return true; }
  return false;
}

}  // namespace

extern "C" {

// names: packed "N\0CA\0C\0..."; res3: packed 3-letter codes; aatypes aligned.
void pdb_set_tables(const char* atom_names, int n_atoms,
                    const char* res_names3, const int32_t* aatypes, int n_res,
                    int unk_aatype) {
  g_atom_order.clear();
  g_atom_names.clear();
  const char* p = atom_names;
  for (int i = 0; i < n_atoms; ++i) {
    g_atom_order[std::string(p)] = i;
    g_atom_names.emplace_back(p);
    p += std::strlen(p) + 1;
  }
  g_res_order.clear();
  g_res_names.assign(n_res + 1, "UNK");
  p = res_names3;
  for (int i = 0; i < n_res; ++i) {
    g_res_order[std::string(p)] = aatypes[i];
    if (aatypes[i] >= 0 && aatypes[i] <= n_res) g_res_names[aatypes[i]] = p;
    p += std::strlen(p) + 1;
  }
  g_unk_aatype = unk_aatype;
}

// Pass 1: out[0]=n_models, out[1]=n_residues(first model), out[2]=consistent.
void pdb_scan(const char* text, int64_t len, int64_t* out) {
  int64_t n_models = 0;
  int64_t first_res = 0, cur_res = 0;
  bool consistent = true;
  std::unordered_map<ResidueKey, int, KeyHash> seen;
  bool in_model = false;

  auto flush = [&]() {
    if (!in_model) return;
    if (n_models == 0) first_res = cur_res;
    else if (cur_res != first_res) consistent = false;
    ++n_models;
    cur_res = 0;
    seen.clear();
    in_model = false;
  };

  for_each_line(text, len, [&](LineView l) {
    bool is_het = false;
    if (l.n >= 6 &&
        (std::memcmp(l.p, "ENDMDL", 6) == 0 ||
         (std::memcmp(l.p, "MODEL", 5) == 0 && in_model))) {
      flush();
      return;
    }
    if (!is_atom_line(l, &is_het)) return;
    std::string res3 = strip(l.p + 17, 3);
    if (is_het && res3 != "MSE") return;
    char alt = l.p[16];
    if (alt != ' ' && alt != 'A' && alt != '1') return;
    std::string atom = strip(l.p + 12, 4);
    if (res3 == "MSE" && atom == "SE") atom = "SD";
    if (g_atom_order.find(atom) == g_atom_order.end()) return;
    ResidueKey key{l.p[21], parse_int(l.p + 22, 4), l.p[26]};
    if (seen.emplace(key, static_cast<int>(cur_res)).second) ++cur_res;
    in_model = true;
  });
  flush();
  out[0] = n_models;
  out[1] = first_res;
  out[2] = consistent ? 1 : 0;
}

// Pass 2: fill arrays sized from pdb_scan.
//   positions: [n_models, n_res, n_atoms, 3] float32
//   mask:      [n_models, n_res, n_atoms]     float32
//   bfactors:  [n_models, n_res, n_atoms]     float32
//   aatype:    [n_res] int32 (from first model)
//   res_index / chain_index: [n_res] int32
// Returns number of models actually filled (<= n_models).
int64_t pdb_parse(const char* text, int64_t len, int64_t n_models,
                  int64_t n_res, int64_t n_atoms, float* positions,
                  float* mask, float* bfactors, int32_t* aatype,
                  int32_t* res_index, int32_t* chain_index) {
  int64_t model = 0;
  int64_t cur_res = 0;
  bool in_model = false;
  std::unordered_map<ResidueKey, int, KeyHash> res_of;
  std::vector<char> chain_ids;

  auto flush = [&]() {
    if (!in_model) return;
    ++model;
    cur_res = 0;
    res_of.clear();
    in_model = false;
  };

  for_each_line(text, len, [&](LineView l) {
    if (model >= n_models) return;
    bool is_het = false;
    if (l.n >= 6 &&
        (std::memcmp(l.p, "ENDMDL", 6) == 0 ||
         (std::memcmp(l.p, "MODEL", 5) == 0 && in_model))) {
      flush();
      return;
    }
    if (!is_atom_line(l, &is_het)) return;
    std::string res3 = strip(l.p + 17, 3);
    if (is_het && res3 != "MSE") return;
    char alt = l.p[16];
    if (alt != ' ' && alt != 'A' && alt != '1') return;
    std::string atom = strip(l.p + 12, 4);
    if (res3 == "MSE" && atom == "SE") atom = "SD";
    auto it = g_atom_order.find(atom);
    if (it == g_atom_order.end()) return;
    int a = it->second;

    ResidueKey key{l.p[21], parse_int(l.p + 22, 4), l.p[26]};
    auto [rit, inserted] = res_of.emplace(key, static_cast<int>(cur_res));
    if (inserted) {
      if (cur_res >= n_res) return;  // inconsistent model; clamp
      if (model == 0) {
        std::string canonical = (res3 == "MSE") ? "MET" : res3;
        auto ait = g_res_order.find(canonical);
        aatype[cur_res] = (ait != g_res_order.end()) ? ait->second : g_unk_aatype;
        res_index[cur_res] = key.resseq;
        int ci = -1;
        for (size_t i = 0; i < chain_ids.size(); ++i)
          if (chain_ids[i] == key.chain) { ci = static_cast<int>(i); break; }
        if (ci < 0) { ci = static_cast<int>(chain_ids.size()); chain_ids.push_back(key.chain); }
        chain_index[cur_res] = ci;
      }
      ++cur_res;
    }
    int r = rit->second;
    if (r >= n_res) return;

    int64_t base = (model * n_res + r) * n_atoms + a;
    if (mask[base] != 0.0f) return;  // first occurrence wins
    positions[base * 3 + 0] = parse_float(l.p + 30, 8);
    positions[base * 3 + 1] = parse_float(l.p + 38, 8);
    positions[base * 3 + 2] = parse_float(l.p + 46, 8);
    mask[base] = 1.0f;
    bfactors[base] = (l.n >= 66) ? parse_float(l.p + 60, 6) : 0.0f;
    in_model = true;
  });
  flush();
  return model;
}


// ---------------------------------------------------------------------------
// Fast multi-model PDB WRITER (inverse of the parser above). Formats atom37
// ensembles into fixed-column ATOM records with the exact layout of the
// Python writer (io/protein.py:to_pdb): MODEL/TER/ENDMDL/END framing,
// serial numbering restarting per model, chain TER breaks.
//
//   pdb_write_size(...)  -- upper bound on output bytes
//   pdb_write(...)       -- fill caller buffer, returns bytes written

int64_t pdb_write_size(int64_t n_models, int64_t n_res, int64_t n_atoms37) {
  // 81 bytes per ATOM/TER line + model framing, with slack.
  return n_models * (n_res * (n_atoms37 + 2) * 81 + 64) + 64;
}

int64_t pdb_write(const float* positions,  // (M, L, A, 3)
                  const float* mask,       // (L, A)
                  const int32_t* aatype,   // (L,)
                  const int32_t* res_index,  // (L,)
                  const int32_t* chain_index,  // (L,)
                  const float* bfactors,   // (L, A)
                  int64_t n_models, int64_t n_res, int64_t n_atoms,
                  int force_multi, char* out, int64_t capacity) {
  char* w = out;
  char* cap = out + capacity - 96;
  const bool multi = force_multi || n_models > 1;
  for (int64_t m = 0; m < n_models; ++m) {
    if (w > cap) return -1;
    if (multi) w += std::snprintf(w, 32, "MODEL     %4d\n", (int)(m + 1));
    int serial = 1;
    char prev_chain = 0;
    const char* name3 = "UNK";
    // TER carries the LAST residue of the chain being terminated (matches
    // io/protein.py:_write_model and the reference's _chain_end).
    const char* prev_name3 = "UNK";
    int prev_resi = 0;
    for (int64_t i = 0; i < n_res; ++i) {
      int rt = aatype[i];
      name3 = (rt >= 0 && rt < (int)g_res_names.size() - 1)
                  ? g_res_names[rt].c_str() : "UNK";
      char cid = kChainIds[chain_index[i] % kMaxChains];
      if (prev_chain != 0 && cid != prev_chain) {
        if (w > cap) return -1;
        w += std::snprintf(w, 48, "TER   %5d      %s %c%4d\n", serial,
                           prev_name3, prev_chain, prev_resi);
        ++serial;
      }
      prev_chain = cid;
      prev_name3 = name3;
      prev_resi = res_index[i];
      const float* pos_row = positions + ((m * n_res + i) * n_atoms) * 3;
      const float* mask_row = mask + i * n_atoms;
      const float* b_row = bfactors + i * n_atoms;
      for (int64_t j = 0; j < n_atoms; ++j) {
        if (mask_row[j] < 0.5f) continue;
        if (w > cap) return -1;
        const std::string& an = g_atom_names[j];
        char name_field[6];
        if (an.size() == 4) {
          std::snprintf(name_field, 6, "%s", an.c_str());
        } else {
          std::snprintf(name_field, 6, " %-3s", an.c_str());
        }
        w += std::snprintf(
            w, 96, "ATOM  %5d %s %s %c%4d    %8.3f%8.3f%8.3f%6.2f%6.2f"
            "          %2c\n",
            serial, name_field, name3, cid, res_index[i],
            pos_row[j * 3], pos_row[j * 3 + 1], pos_row[j * 3 + 2], 1.0f,
            b_row[j], an[0]);
        ++serial;
      }
    }
    if (w > cap) return -1;
    w += std::snprintf(w, 48, "TER   %5d      %s %c%4d\n", serial,
                       prev_name3, prev_chain, prev_resi);
    if (multi) w += std::snprintf(w, 16, "ENDMDL\n");
  }
  w += std::snprintf(w, 8, "END\n");
  return w - out;
}

}  // extern "C"
