/* nc3: minimal netCDF-3 (classic / 64-bit offset) reader+writer.
 *
 * Just enough of the format for the preconditioner tools: dimensions, double
 * and int variables (fixed-size, i.e. no record dimension), text attributes.
 * Files written here are readable by any netCDF library, and files produced
 * by the Python layer (scipy-based) read back cleanly.
 */

#ifndef NK_TPU_NC3_H
#define NK_TPU_NC3_H

#include <cstdint>
#include <map>
#include <string>
#include <vector>

namespace nc3 {

enum Type { NC_BYTE = 1, NC_CHAR = 2, NC_SHORT = 3, NC_INT = 4,
            NC_FLOAT = 5, NC_DOUBLE = 6 };

struct Var {
    std::string name;
    std::vector<std::string> dims;
    Type type = NC_DOUBLE;
    std::map<std::string, std::string> text_attrs;
    /* values held as doubles regardless of on-disk type */
    std::vector<double> data;
    std::vector<size_t> shape;  /* resolved dimension lengths */
    size_t size() const {
        size_t s = 1;
        for (size_t d : shape) s *= d;
        return s;
    }
};

struct File {
    std::vector<std::pair<std::string, size_t>> dims;  /* ordered */
    std::map<std::string, std::string> text_gatts;
    std::vector<Var> vars;

    size_t dim_len(const std::string &name) const;
    const Var *find(const std::string &name) const;
    Var *find(const std::string &name);
    Var &add_var(const std::string &name, Type type,
                 const std::vector<std::string> &dims_in);
    void add_dim(const std::string &name, size_t len);
};

/* read all fixed-size variables of a netCDF-3 file (record vars: only the
 * first record is materialized) */
File read(const std::string &fname);

/* write a netCDF-3 64-bit-offset file */
void write(const std::string &fname, const File &file);

}  /* namespace nc3 */

#endif
